package graft.operators

import graft.Tables
import graft.functions.TopicMatches.topicMatches
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact._

/** Event-stream operators — the batch-queryable core of what the
  * reference's Beam pipelines compute over Solace messages
  * (fixed/sliding/session windows, routing, redelivery dedup,
  * sender-vs-receive timestamps). The same logic is reused by the
  * Structured Streaming layer; keeping it batch-expressible is what
  * lets the DuckDB oracle check it.
  *
  * Scale notes: every query here is a single shuffle on its group
  * keys with map-side partial aggregation; windows are computed by
  * expression (no sort), sessions by Spark's native session_window
  * merge. Subscriptions are a tiny broadcast side.
  */
object EventOps {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  /** Tumbling 1-hour windows per event type. */
  def tumblingAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum2(d4(col("value"))).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  val tumblingSql: String =
    """SELECT date_trunc('hour', ts) AS ws, event_type,
      | count(*) AS n,
      | CAST(round(sum(CAST(value AS DECIMAL(14,4))),2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding 2-hour windows advancing hourly. Each event lands in two
    * windows; the expansion happens in the window() expression, not a
    * self-join. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum2(d4(col("value"))).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  val slidingSql: String =
    """SELECT date_trunc('hour', ts) - k * INTERVAL '1 hour' AS ws, event_type,
      | count(*) AS n,
      | CAST(round(sum(CAST(value AS DECIMAL(14,4))),2) AS DOUBLE) AS sum_value
      |FROM events, (SELECT unnest([0,1]) AS k)
      |GROUP BY 1, 2""".stripMargin

  /** Step (15 min) and step-count (4 → a 1-hour window) for the
    * sliding distinct-user count pair. */
  val slideStepUs: Long = 900L * 1000000L
  val slideSteps: Int = 4

  /** Distinct users per 1-hour window sliding every 15 min — EXACT.
    * `window()` can't carry a DISTINCT across its expansion, so the
    * event explodes to the [[slideSteps]] windows covering it and a
    * plain `count_distinct` groups per window start. The honest cost:
    * the dedup shuffle carries slide-factor × the event volume — at
    * 100 TB this plan is the oracle twin, and
    * [[distinctSlidingApprox]] is the deployment shape (its shuffles
    * never scale with the slide factor × data product). Window starts
    * are integer-µs bucket arithmetic, so both engines bucket
    * identically. */
  def distinctSliding(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $slideStepUs").as("bkt"))
      .select(col("user_id"),
        explode(sequence(col("bkt") - (slideSteps - 1), col("bkt"))).as("w"))
      .groupBy(col("w"))
      .agg(count_distinct(col("user_id")).as("users"))
      .select((col("w") * slideStepUs).as("window_start_us"), col("users"))

  val distinctSlidingSql: String =
    s"""SELECT w * $slideStepUs AS window_start_us,
       | CAST(count(DISTINCT user_id) AS BIGINT) AS users
       |FROM (SELECT user_id,
       |  unnest(generate_series(epoch_us(ts) // $slideStepUs - ${slideSteps - 1},
       |                         epoch_us(ts) // $slideStepUs)) AS w
       |  FROM events)
       |GROUP BY w""".stripMargin

  /** [[distinctSliding]]'s 100 TB shape: sketch-merge instead of
    * re-deduplicating every overlapping window. One shuffle builds a
    * ~1 KB HLL sketch per TUMBLING step bucket (map-side partial
    * sketches combine — raw user ids cross the wire once, not
    * slide-factor times); the sketch rows then explode to the windows
    * they cover and a second, DATA-INDEPENDENT shuffle unions ≤
    * buckets × slide-factor sketches. Growing the slide factor or the
    * event volume never multiplies the dedup shuffle — the trade is
    * HLL's ~1.6% rsd (lgK 12), spec-bounded at 5% against the exact
    * twin. Not SQL-expressible cross-engine (DuckDB's
    * approx_count_distinct is a different sketch) → rows-only gate +
    * spec, like the other approx twins. */
  def distinctSlidingApprox(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $slideStepUs").as("bkt"))
      .groupBy(col("bkt"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(col("sk"),
        explode(sequence(col("bkt") - (slideSteps - 1), col("bkt"))).as("w"))
      .groupBy(col("w"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .select((col("w") * slideStepUs).as("window_start_us"), col("approx_users"))

  /** Session windows per user with a 30-minute inactivity gap
    * (Spark's native session_window: sessions merge on shuffle,
    * no per-key sort in the plan we write). */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum2(d4(col("value"))).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"), col("sum_value"))

  val sessionSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, value,
      |   CASE WHEN lag(ts) OVER w IS NULL
      |          OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
      |        THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, ts, value,
      |   sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n,
      | CAST(round(sum(CAST(value AS DECIMAL(14,4))),2) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid""".stripMargin

  /** Solace-style topic routing: topic = events/<type>/u<user>,
    * matched against wildcard subscriptions with the custom
    * codegen'd TopicMatches predicate. An event fans out to every
    * matching subscription (broker semantics). Subscriptions are a
    * broadcast literal table. */
  val subscriptions: Seq[String] = Seq(
    "events/*/u7",       // any type, user 7
    "events/click/>",    // all click subtopics
    "events/>",          // firehose
    "events/purch*/u3",  // prefix level match
    "events/error/u1")   // exact

  def topicRoute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val subs = subscriptions.toDF("sub")
    val ev = events(spark, dir)
      .withColumn("topic",
        concat(lit("events/"), col("event_type"), lit("/u"), col("user_id")))
    ev.crossJoin(broadcast(subs))
      .filter(topicMatches(col("sub"), col("topic")))
      .groupBy(col("sub"))
      .agg(count(lit(1)).as("n"), sum2(d4(col("value"))).as("sum_value"))
  }

  val topicRouteSql: String = {
    // Hand-compiled regex per subscription — independent derivation of
    // the same Solace wildcard semantics for the oracle.
    val cases = Seq(
      "events/*/u7"      -> "^events/[^/]+/u7$",
      "events/click/>"   -> "^events/click/.+$",
      "events/>"         -> "^events/.+$",
      "events/purch*/u3" -> "^events/purch[^/]*/u3$",
      "events/error/u1"  -> "^events/error/u1$")
    val parts = cases.map { case (sub, re) =>
      s"""SELECT '$sub' AS sub, count(*) AS n,
         | CAST(round(sum(CAST(value AS DECIMAL(14,4))),2) AS DOUBLE) AS sum_value
         |FROM (SELECT 'events/' || event_type || '/u' || user_id AS topic, value FROM events)
         |WHERE regexp_matches(topic, '$re')""".stripMargin
    }.mkString("", "\nUNION ALL\n", "")
    s"SELECT * FROM ($parts) WHERE n > 0"
  }

  /** At-least-once → exactly-once: a redelivered tail (every 10th
    * message re-appears) is collapsed by message-id dedup before
    * counting. Mirrors SolaceCheckpointMark ack semantics where
    * un-acked messages are redelivered. */
  def msgDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select("event_id", "event_type")
    val redelivered = ev.filter(col("event_id") % 10 === 0)
    ev.unionAll(redelivered)
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
  }

  val msgDedupSql: String =
    """SELECT event_type, count(*) AS n_unique FROM (
      | SELECT DISTINCT event_id, event_type FROM (
      |  SELECT event_id, event_type FROM events
      |  UNION ALL
      |  SELECT event_id, event_type FROM events WHERE event_id % 10 = 0))
      |GROUP BY event_type""".stripMargin

  /** Skew-salted join: 70% of events collapse onto one hot key — the
    * classic power-law shuffle killer. The fact side salts the hot key
    * deterministically (event_id % 16) and the dim side explodes ×16,
    * so the hot key spreads over 16 reducers instead of one. The
    * oracle is the UNSALTED join — salting must not change results.
    * (On a real cluster AQE skew-join splits post-hoc; explicit
    * salting is the plan-level guarantee for known-hot keys.)
    *
    * `salts` is a caller knob: the hot key spreads over `salts`
    * reducers, so size it to the hot key's share of the data divided
    * by a healthy per-task row count — a key holding 70% of a 100 TB
    * fact wants hundreds of salt buckets, not 16. The dim side
    * replicates ×salts, so only salt known-hot keys when the dim is
    * small enough to wear that factor (here it is 100 rows). */
  val saltBuckets = 16

  def skewSaltedJoin(spark: SparkSession, dir: String,
                     salts: Int = saltBuckets): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir)
      .withColumn("k",
        when(col("event_id") % 10 < 7, lit(0L)).otherwise(col("event_id") % 100))
      .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
    val dim = (0L until 100L).map(k => (k, s"seg${k % 7}")).toDF("k", "segment")
    val dimSalted = dim
      .withColumn("salt", explode(lit((0 until salts).toArray)))
    ev.join(dimSalted, Seq("k", "salt"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum2(d4(col("value"))).as("sum_value"))
  }

  val skewSaltedSql: String =
    """WITH ev AS (
      |  SELECT CASE WHEN event_id % 10 < 7 THEN 0 ELSE event_id % 100 END AS k, value
      |  FROM events),
      |dim AS (SELECT k, 'seg' || (k % 7) AS segment FROM range(0, 100) t(k))
      |SELECT segment, count(*) AS n,
      | CAST(round(sum(CAST(value AS DECIMAL(14,4))),2) AS DOUBLE) AS sum_value
      |FROM ev JOIN dim USING (k)
      |GROUP BY segment""".stripMargin

  /** Skew STRESS pair — same semantics as [[skewSaltedJoin]] but with
    * the join FORCED to shuffle-merge (`hint("merge")`): the 100 TB
    * case where the dim side is not broadcastable and the fact must
    * shuffle on the join key. Unsalted, the hot key (70% of rows)
    * lands in ONE reducer's sort — the straggler that stretches the
    * stage to the hot key's share of the data; salted, it spreads over
    * `salts` reducers. Benched as q_skew_shuffle_salted /
    * q_skew_shuffle_unsalted so the salting claim is a measured
    * number, not an assertion. (AQE's skew-join split would also
    * rescue the unsalted plan once the hot partition crosses
    * skewedPartitionThresholdInBytes=256 MB; below that threshold —
    * as in local bench runs — explicit salting is the only spread,
    * which is exactly why known-hot keys get salted at plan level.)
    * Salting must not change results: both variants share the
    * UNSALTED oracle, hash-gated. */
  def skewShuffleJoin(spark: SparkSession, dir: String,
                      salts: Int = saltBuckets,
                      salted: Boolean = true): DataFrame = {
    import spark.implicits._
    val saltCol = if (salted) pmod(col("event_id"), lit(salts)).cast("int") else lit(0)
    val ev = events(spark, dir)
      .withColumn("k",
        when(col("event_id") % 10 < 7, lit(0L)).otherwise(col("event_id") % 100))
      .withColumn("salt", saltCol)
    val dim = (0L until 100L).map(k => (k, s"seg${k % 7}")).toDF("k", "segment")
    val dimSalted =
      if (salted) dim.withColumn("salt", explode(lit((0 until salts).toArray)))
      else dim.withColumn("salt", lit(0))
    ev.join(dimSalted.hint("merge"), Seq("k", "salt"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum2(d4(col("value"))).as("sum_value"))
  }

  /** Heavy-hitter frequency floor: items holding > 1/φ of the stream. */
  val hhPhi = 50

  /** Misra-Gries counter budget for the candidate sketch. MUST exceed
    * [[hhPhi]]: the sketch undercounts by at most n/(k+1), so
    * k + 1 > φ guarantees every true heavy hitter (count > n/φ >
    * n/(k+1)) survives with a positive counter — the property the
    * exact verify pass leans on. 256 for φ = 50 leaves the bound at
    * ~0.4% of n against a 2% admission floor. */
  val hhSketchK = 256

  /** The heavy-hitter item stream, synthesized skew (the
    * [[skewSaltedJoin]] precedent — the natural columns are uniform
    * by construction): 70% of events collapse onto 7 hot items
    * (~10% of the stream each), the rest spread over 997 cold items
    * (~0.03% each) — a 1,004-key domain against a 256-counter sketch,
    * so eviction actually runs at every scale. */
  private def hhItems(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      when(col("event_id") % 10 < 7, col("event_id") % 7)
        .otherwise(lit(1000) + col("event_id") % 997).as("item"))

  /** Heavy hitters (items with count·φ > n) via SKETCH → VERIFY — the
    * 100 TB form of `GROUP BY item HAVING`, which shuffles one row
    * per DISTINCT item (a full-width shuffle of a 10⁹-key domain to
    * find a handful of rows). Pass 1 runs the bounded
    * [[graft.functions.MisraGriesAgg]] sketch (k counters per mapper,
    * merged map-side — the shuffle carries ≤ k rows per mapper
    * regardless of the item domain) whose k > φ guarantee puts every
    * true heavy hitter in the candidate set; pass 2 exact-counts ONLY
    * the ≤ k candidates (broadcast semi-join onto the stream, then a
    * partial-aggregated count whose shuffle carries ≤ k groups) and
    * applies the exact HAVING against the in-plan total.
    *
    * The composition is DETERMINISTIC even though any MG summary's
    * surviving-counter set is arrival-order-dependent: the candidate
    * set is provably a SUPERSET of the true heavy hitters under every
    * order/merge shape, and the exact verify discards the
    * order-dependent extras — so the oracle is the plain exact SQL.
    * (Same philosophy as the dedup suite: sketch for candidates,
    * exact arithmetic for the answer.) */
  def heavyHitters(spark: SparkSession, dir: String,
                   phi: Int = hhPhi, sketchK: Int = hhSketchK): DataFrame = {
    require(sketchK > phi,
      s"sketchK ($sketchK) must exceed phi ($phi) for the superset guarantee")
    val items = hhItems(spark, dir)
    val total = items.agg(count(lit(1)).as("n_total")).scalar()
    val cands = items
      .agg(graft.functions.FreqColumns.mgTopFreq(col("item"), sketchK).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("item"))
    items.join(broadcast(cands), Seq("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * phi > total)
  }

  val heavyHittersSql: String =
    s"""WITH s AS (
       |  SELECT CASE WHEN event_id % 10 < 7 THEN event_id % 7
       |              ELSE 1000 + event_id % 997 END AS item
       |  FROM events)
       |SELECT item, count(*) AS cnt
       |FROM s GROUP BY item
       |HAVING count(*) * $hhPhi > (SELECT count(*) FROM s)""".stripMargin

  /** Statistical moments per event type from EXACT sums: mean,
    * population variance, and corr(value, lag). Spark's corr/stddev
    * use Welford-style merges whose float result depends on partition
    * order; assembling the moments from exact decimal sums in a fixed
    * double-arithmetic order is order-independent AND bit-identical
    * to the oracle. */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).withColumn("lag_s", col("event_id") % 7)
    val agg = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(d4(col("value"))).as("sx"),
      sum(d4(col("value")) * d4(col("value"))).as("sx2"),
      sum(col("lag_s")).as("sy"),
      sum(col("lag_s") * col("lag_s")).as("sy2"),
      sum(d4(col("value")) * col("lag_s")).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sx2 = col("sx2").cast("double")
    val sy = col("sy").cast("double"); val sy2 = col("sy2").cast("double")
    val sxy = col("sxy").cast("double")
    agg.select(
      col("event_type"), col("n"),
      (sx / n).as("mean_value"),
      ((sx2 - sx * sx / n) / n).as("var_pop"),
      ((n * sxy - sx * sy) /
        (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy))).as("corr_value_lag"))
  }

  val statsMomentsSql: String =
    """WITH a AS (
      | SELECT event_type, count(*) AS n,
      |  sum(CAST(value AS DECIMAL(14,4))) AS sx,
      |  sum(CAST(value AS DECIMAL(14,4)) * CAST(value AS DECIMAL(14,4))) AS sx2,
      |  sum(event_id % 7) AS sy,
      |  sum((event_id % 7) * (event_id % 7)) AS sy2,
      |  sum(CAST(value AS DECIMAL(14,4)) * (event_id % 7)) AS sxy
      | FROM events GROUP BY event_type)
      |SELECT event_type, n,
      | CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
      | (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_pop,
      | (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |  (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |   sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_value_lag
      |FROM a""".stripMargin

  /** Rank-based (discrete) percentiles per event type: the
    * ceil(p·n)-th smallest value, rank math in pure integers, ties
    * broken by event_id — an actual data value, no interpolation, so
    * no cross-engine float drift by construction. */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    val ranked = events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    def pick(num: Int, den: Int): Column =
      max(when(col("rn") === floor((col("n") * num + (den - 1)) / den), col("value")))
    ranked.groupBy(col("event_type")).agg(
      max(col("n")).as("n"),
      pick(1, 2).as("p50"),
      pick(9, 10).as("p90"),
      pick(99, 100).as("p99"))
  }

  val percentilesSql: String =
    """WITH r AS (
      | SELECT event_type, value,
      |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |  count(*) OVER (PARTITION BY event_type) AS n
      | FROM events)
      |SELECT event_type, max(n) AS n,
      | max(CASE WHEN rn = (n * 1 + 1) // 2   THEN value END) AS p50,
      | max(CASE WHEN rn = (n * 9 + 9) // 10  THEN value END) AS p90,
      | max(CASE WHEN rn = (n * 99 + 99) // 100 THEN value END) AS p99
      |FROM r GROUP BY event_type""".stripMargin

  /** Sender-vs-receive timestamp lag profile (the useSenderTimestamp
    * choice in SolaceIO.Read): synthesize a deterministic broker delay
    * and report per-type lag stats. */
  def senderVsReceiveTs(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("lag_s", col("event_id") % 7)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("lag_s")).cast("double") / count(lit(1))).as("avg_lag_s"),
        max(col("lag_s")).as("max_lag_s"))

  val senderVsReceiveSql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(event_id % 7) AS DOUBLE)/count(*) AS avg_lag_s,
      | max(event_id % 7) AS max_lag_s
      |FROM events GROUP BY event_type""".stripMargin

  /** Sketch percentiles: approx_percentile (GK/KLL-family summary)
    * next to the group keys — the bounded-memory path for quantiles at
    * 100 TB, where the exact rank-based q_percentiles would need a full
    * sort per group. Accuracy 10000 ⇒ rank error ≤ n/10000; the spec
    * bounds it against the exact rank-based values (no cross-engine
    * oracle: sketch implementations differ). */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("ap50"),
        percentile_approx(col("value"), lit(0.9), lit(10000)).as("ap90"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("ap99"),
        count(lit(1)).as("n"))

  /** Semi-structured extraction: events carry a JSON `props` payload;
    * pull a typed field out at scan time and aggregate it — the
    * schema-on-read pattern (get_json_object stays inside codegen; no
    * UDF, no whole-document parse into a struct the query doesn't
    * need). Aggregates are exact integers / one double division. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    events(spark, dir)
      .select(col("event_type"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
           sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"),
           (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
  }

  val jsonPropsSql: String =
    """SELECT event_type,
      | count(k) AS n_with_k,
      | CAST(sum(k) AS BIGINT) AS sum_k,
      | max(k) AS max_k,
      | CAST(sum(k) AS DOUBLE)/count(k) AS avg_k
      |FROM (
      | SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      | FROM events)
      |GROUP BY event_type""".stripMargin

  /** Cumulative / lag analytics per user — the running-frame window
    * shapes (ROWS UNBOUNDED PRECEDING, lag()) the suite did not cover
    * yet. Determinism: frame order is (ts, event_id) — unique —, the
    * running sum accumulates exact DECIMAL per frame, and the
    * inter-event gap is integer microseconds; nothing depends on
    * float summation order. Output kept to every-100th user so the
    * result set stays comparison-sized while the window still runs
    * over full per-user partitions. */
  def cumulative(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .filter(col("user_id") % 100 === 0)
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(wRun).as("run_n"),
        round(sum(d4(col("value"))).over(wRun), 2).cast("double").as("run_sum"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
  }

  val cumulativeSql: String =
    """SELECT event_id, user_id, ts,
      | count(*) OVER w_run AS run_n,
      | CAST(round(sum(CAST(value AS DECIMAL(14,4))) OVER w_run, 2) AS DOUBLE) AS run_sum,
      | epoch_us(ts) - epoch_us(lag(ts, 1) OVER w_ord) AS gap_us
      |FROM events
      |WHERE user_id % 100 = 0
      |WINDOW
      | w_run AS (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      | w_ord AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** Trailing window for [[rangeFrame]], in seconds. */
  val trailWindowSec = 3600L

  /** RANGE-frame windowed aggregate — the frame family [[cumulative]]
    * (ROWS unbounded) and [[slidingAgg]] (bucketed expression windows)
    * don't cover: per event row, the sum/count of the SAME TYPE's
    * values inside the trailing wall-clock hour, a frame whose extent
    * is defined by the ORDER value, not a row count. Ordering is
    * integer microseconds so the frame boundary is exact on both
    * engines, and tied timestamps are frame PEERS (identical results
    * regardless of intra-tie order — RANGE semantics make the query
    * deterministic without a tiebreaker). The sum accumulates in
    * exact decimal (order-free), one final round.
    *
    * Scale: one shuffle on event_type + one sort — same cost class as
    * any per-key window. At 100 TB the partition-per-type skew is
    * real (few types, big partitions); the deployment shape composes
    * a coarse time-bucket into the partition key and stitches frames
    * across the single boundary bucket, exactly the [[rangeJoin]]
    * bucketing argument. */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-trailWindowSec * 1000000L, Window.currentRow)
    events(spark, dir).select(
      col("event_id"), col("event_type"),
      count(lit(1)).over(w).as("trail_n"),
      round(sum(d4(col("value"))).over(w), 2).cast("double").as("trail_sum"))
  }

  val rangeFrameSql: String =
    s"""SELECT event_id, event_type,
       | CAST(count(*) OVER w AS BIGINT) AS trail_n,
       | CAST(round(sum(CAST(value AS DECIMAL(14,4))) OVER w, 2) AS DOUBLE)
       |  AS trail_sum
       |FROM events
       |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
       | RANGE BETWEEN ${trailWindowSec * 1000000L} PRECEDING
       |       AND CURRENT ROW)""".stripMargin

  /** 3-sigma outlier report per event type — the anomaly screen an
    * ops pipeline runs on a metric stream. Mean and variance come
    * from exact decimal sums (one shuffle with map-side partials,
    * the [[statsMoments]] moment shapes); the outlier test is
    * `(v − mean)² > 9·var` — squared form, so no sqrt and no abs, and
    * every operand is either an exact decimal cast to double or ONE
    * IEEE division of exact decimals, making the flag bit-identical
    * cross-engine. The tiny per-type stats table joins back to the
    * event stream (AQE broadcasts it), and types with no outliers
    * keep their row via the left join. */
  def anomalies(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"), d4(col("value")).as("v"))
    val stats = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("sx"),
        sum(col("v") * col("v")).as("sx2"))
      .select(col("event_type"), col("n"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean_value"),
        ((col("sx2").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n").cast("double"))
          / col("n").cast("double")).as("var_pop"))
    val vd = col("v").cast("double")
    val out = ev.join(stats, "event_type")
      .filter((vd - col("mean_value")) * (vd - col("mean_value"))
        > lit(9.0) * col("var_pop"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_out"), max(vd).as("max_outlier"))
    stats.join(out, Seq("event_type"), "left")
      .select(col("event_type"), col("n"), col("mean_value"), col("var_pop"),
        coalesce(col("n_out"), lit(0L)).as("n_outliers"), col("max_outlier"))
  }

  val anomaliesSql: String =
    """WITH v AS (
      | SELECT event_type, CAST(value AS DECIMAL(14,4)) AS v FROM events),
      |s AS (
      | SELECT event_type, count(*) AS n, sum(v) AS sx, sum(v*v) AS sx2
      | FROM v GROUP BY 1),
      |m AS (
      | SELECT event_type, n,
      |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_value,
      |  (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS var_pop
      | FROM s),
      |o AS (
      | SELECT v.event_type, count(*) AS n_out,
      |  max(CAST(v AS DOUBLE)) AS max_outlier
      | FROM v JOIN m USING (event_type)
      | WHERE (CAST(v AS DOUBLE) - mean_value) * (CAST(v AS DOUBLE) - mean_value)
      |   > 9 * var_pop
      | GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n, mean_value, var_pop,
      | CAST(COALESCE(n_out, 0) AS BIGINT) AS n_outliers, max_outlier
      |FROM m LEFT JOIN o USING (event_type)""".stripMargin

  /** Per-step funnel conversion window: a later step only counts if it
    * happens within this long of the previous step (µs). Unbounded
    * funnels saturate — every active user eventually does everything. */
  val funnelWindowUs: Long = 3600L * 1000000L

  /** Conversion funnel view → click → purchase: per user, the first
    * view, the first click within [[funnelWindowUs]] of it, the first
    * purchase within the window of THAT — then one summary row with
    * per-step user counts and exact total step-lag µs.
    *
    * Shape at scale: each step is a groupBy(user) min over a filtered
    * event scan joined to the previous step's (user, ts) table — all
    * equi-joins on user_id, each step's output strictly shrinks, and
    * the final roll-ups are 1-row aggregates crossed together (the
    * q22 scalar pattern). Timestamps stay integer µs end to end:
    * counts and lag sums are exact, no interval/double drift. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tu"))
    // each step CARRIES the previous step's timestamp through its
    // aggregate (min of a per-user constant), so the lag roll-ups are
    // plain 1-row aggregates — no join-back to the previous step
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tu")).as("t1"))
    val s2 = e.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("tu") > col("t1") && col("tu") <= col("t1") + funnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("tu")).as("t2"), min(col("t1")).as("t1"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("tu") > col("t2") && col("tu") <= col("t2") + funnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("tu")).as("t3"), min(col("t2")).as("t2"))
    val r1 = s1.agg(count(lit(1)).as("n_view"))
    val r2 = s2.agg(count(lit(1)).as("n_click"),
      sum(col("t2") - col("t1")).as("view_to_click_us"))
    val r3 = s3.agg(count(lit(1)).as("n_purchase"),
      sum(col("t3") - col("t2")).as("click_to_purchase_us"))
    r1.crossJoin(r2).crossJoin(r3)
  }

  val funnelSql: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
       |s1 AS (SELECT user_id, min(tu) AS t1 FROM e
       |       WHERE event_type = 'view' GROUP BY 1),
       |s2 AS (SELECT e.user_id, min(tu) AS t2, min(t1) AS t1
       |       FROM e JOIN s1 USING (user_id)
       |       WHERE event_type = 'click'
       |         AND tu > t1 AND tu <= t1 + $funnelWindowUs GROUP BY 1),
       |s3 AS (SELECT e.user_id, min(tu) AS t3, min(t2) AS t2
       |       FROM e JOIN s2 USING (user_id)
       |       WHERE event_type = 'purchase'
       |         AND tu > t2 AND tu <= t2 + $funnelWindowUs GROUP BY 1),
       |r1 AS (SELECT count(*) AS n_view FROM s1),
       |r2 AS (SELECT count(*) AS n_click,
       |        CAST(sum(t2 - t1) AS BIGINT) AS view_to_click_us FROM s2),
       |r3 AS (SELECT count(*) AS n_purchase,
       |        CAST(sum(t3 - t2) AS BIGINT) AS click_to_purchase_us FROM s3)
       |SELECT * FROM r1, r2, r3""".stripMargin

  /** Cohort retention matrix: users grouped by first-seen day, active
    * users counted per (cohort, day offset). Rows are (user, day)
    * distinct BEFORE the join — the count is then a plain count, not a
    * count-distinct carrying user sets through the shuffle. Integer
    * date math only. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    // day-truncated TIMESTAMPS (not DATE) so both engines land on the
    // same pandas dtype in the hash compare; the offset is integer µs
    // division — exact on day-truncated stamps, no calendar functions
    val act = events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    act.join(first, "user_id")
      .groupBy(col("cohort"),
        expr("(unix_micros(day) - unix_micros(cohort)) div 86400000000")
          .as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  val retentionSql: String =
    """WITH act AS (
      | SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort FROM act GROUP BY 1)
      |SELECT cohort,
      | (epoch_us(day) - epoch_us(cohort)) // 86400000000 AS day_offset,
      | count(*) AS n_active
      |FROM act JOIN f USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** Event-sequence transition mining — the Markov-chain view of user
    * behavior (which event type follows which): per user, order by
    * (ts, event_id) — the id tiebreak makes equal-timestamp ordering
    * deterministic cross-engine — take lead(event_type), count each
    * (from, to) pair, and attach each transition's share of its
    * from-type's outgoing edges.
    *
    * Shape at scale: ONE user-keyed shuffle for the sequence window
    * (per-user state bounded by that user's events), a map-side-
    * combinable pair count (|types|² groups), and a |types|-sized
    * window for the shares. The share division casts both exact
    * longs to double explicitly (DuckDB's sum(bigint) is HUGEINT —
    * an implicit cast would diverge). */
  def userPath(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val out = Window.partitionBy(col("from_type"))
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(seq))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("share", col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(out).cast("double"))
  }

  val userPathSql: String =
    """WITH s AS (
      | SELECT event_type,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      | FROM events),
      |t AS (
      | SELECT event_type AS from_type, to_type, count(*) AS n_transitions
      | FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_transitions,
      | CAST(n_transitions AS DOUBLE) /
      |   CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE) AS share
      |FROM t""".stripMargin

  /** Equi-width value histogram per event type: 10 buckets over the
    * per-type [min, max] range. The per-type bounds are a dimension-
    * sized aggregate broadcast back onto the scan; the bucket index is
    * the SAME arithmetic expression `(v − lo) · 10 / (hi − lo)` in
    * both engines (IEEE doubles, identical op order → identical
    * floor), with the max value clamped into bucket 9. A degenerate
    * type (hi = lo — one event, or all values equal) is pinned to
    * bucket 0 EXPLICITLY: the raw expression is 0/0 = NaN there, and
    * the engines disagree on NaN (Spark's floor collapses it to 0,
    * DuckDB's least(9, NaN) picks 9 — NaN sorts greatest). */
  val histBuckets = 10

  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val bounds = e.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bucket = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(lit(histBuckets - 1),
        floor((col("value") - col("lo")) * histBuckets / (col("hi") - col("lo"))))
        .cast("long"))
    e.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  val histogramSql: String =
    s"""WITH b AS (
       | SELECT event_type, min(value) AS lo, max(value) AS hi
       | FROM events GROUP BY 1)
       |SELECT e.event_type,
       | CASE WHEN b.hi = b.lo THEN 0
       |   ELSE CAST(least(${histBuckets - 1},
       |     floor((e.value - b.lo) * $histBuckets / (b.hi - b.lo))) AS BIGINT)
       | END AS bucket,
       | count(*) AS n
       |FROM events e JOIN b USING (event_type)
       |GROUP BY 1, 2""".stripMargin
}
