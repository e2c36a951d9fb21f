package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no native operator for, re-expressed
  * with scalable plan shapes instead of non-equi nested loops:
  *
  *  - AS-OF join: for each left row, the latest right row at-or-before
  *    its timestamp. Implemented as union + running `last(ignoreNulls)`
  *    over one (user, time) sort — a SINGLE shuffle, no per-key loop,
  *    no range condition the optimizer would turn into a nested loop.
  *  - RANGE join: count right rows inside a trailing time window of
  *    each left row. Implemented as a BUCKETED equi-join: both sides
  *    key by floor(ts / window); each left row probes its own and the
  *    previous bucket, so candidates are bounded by bucket population
  *    and the plan is a plain shuffle join on (user, bucket) — never
  *    an O(n²) time-range nested loop.
  *  - INTERVAL-OVERLAP join: both sides are intervals, no equi key —
  *    bucketize by the max interval length, explode each interval to
  *    its ≤2 buckets, equi-join on bucket, exact overlap filter, and
  *    emit each pair once from the bucket of the later start (no
  *    distinct needed).
  *
  * Determinism: as-of ties (same timestamp) order reference rows
  * before query rows (inclusive ≤) and break equal reference
  * timestamps by event_id; both rules are mirrored in the oracle.
  */
object TemporalJoins {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  /** For each purchase, the latest click at-or-before it per user. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === "purchase").cast("int").as("m")) // clicks (0) sort first on ties
    val tagged = ev
      .withColumn("click_id", when(col("m") === 0, col("event_id")))
      .withColumn("click_ts", when(col("m") === 0, col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("m").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("asof_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("m") === 1)
      .select("event_id", "user_id", "ts", "asof_click_id", "asof_click_ts")
  }

  val asofJoinSql: String =
    """WITH p AS (
      | SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |a AS (
      | SELECT p.event_id, p.user_id, p.ts,
      |  (SELECT c.event_id FROM events c
      |   WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
      |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_click_id
      | FROM p)
      |SELECT a.event_id, a.user_id, a.ts, a.asof_click_id, c.ts AS asof_click_ts
      |FROM a LEFT JOIN events c ON c.event_id = a.asof_click_id""".stripMargin

  /** For each error, how many clicks the same user made in the
    * trailing 5 minutes (exclusive of the error instant). */
  val rangeWindowSec = 300L

  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val usec = rangeWindowSec * 1000000L
    val errs = events(spark, dir).filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(unix_micros(col("ts")) / usec).as("b"))
      // a trailing window of exactly one bucket length spans at most
      // the row's own bucket and the previous one
      .select(col("event_id"), col("user_id"), col("ts"),
        explode(array(col("b") - 1, col("b"))).as("bkt"))
    val clicks = events(spark, dir).filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        floor(unix_micros(col("ts")) / usec).as("bkt"))
    errs.join(clicks,
        errs("user_id") === clicks("cu") && errs("bkt") === clicks("bkt"), "left_outer")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(when(
        col("cts") >= col("ts") - expr(s"INTERVAL $rangeWindowSec SECONDS")
          && col("cts") < col("ts"), lit(1))).as("n_prior_clicks"))
  }

  /** Interval length for the overlap join's activity windows, in
    * seconds. The join's bucket width equals the MAX interval length,
    * so every interval explodes to at most two buckets. */
  val intervalLenSec = 120L

  /** INTERVAL-OVERLAP join — both sides are intervals and there is NO
    * equi key, the join family neither [[asofJoin]] (point-vs-latest)
    * nor [[rangeJoin]] (point-vs-trailing-count) covers: every
    * (purchase-window, error-window) pair whose 2-minute activity
    * intervals intersect, with the exact overlap length.
    *
    * Scale shape: the canonical bucketed interval join. Time is cut
    * into buckets of the max interval length; each interval explodes
    * to the ≤2 buckets it touches; candidates meet in a plain
    * shuffle EQUI-join on the bucket id (bounded by per-bucket
    * populations — arrival-rate × window, never n²); the exact
    * overlap predicate then filters candidates. Each true pair is
    * emitted EXACTLY ONCE without a distinct: only the bucket
    * containing the LATER start reports it (both intervals provably
    * touch that bucket, and the overlap starts in it), so no dedup
    * shuffle follows the join. Skewed hot buckets are AQE's
    * skew-join case — the key is synthetic and splittable.
    * Determinism: overlap arithmetic is integer microseconds
    * end-to-end; boundary-touching pairs (overlap 0) count as
    * overlapping on both engines (closed intervals). */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val lenUs = intervalLenSec * 1000000L
    def side(tpe: String, p: String): DataFrame =
      events(spark, dir).filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${p}_id"),
          unix_micros(col("ts")).as(s"${p}_s"),
          (unix_micros(col("ts")) + lenUs).as(s"${p}_e"))
    def buckets(df: DataFrame, p: String): DataFrame =
      df.select(col(s"${p}_id"), col(s"${p}_s"), col(s"${p}_e"),
        explode(sequence(
          expr(s"${p}_s div $lenUs"), expr(s"${p}_e div $lenUs"))).as("bkt"))
    buckets(side("purchase", "a"), "a")
      .join(buckets(side("error", "b"), "b"), Seq("bkt"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("bkt") === expr(s"greatest(a_s, b_s) div $lenUs"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_us"))
  }

  /** Order-independent reduction of [[intervalJoin]]'s pair stream —
    * the big-SF gate form: at sf10 the join emits ~368M pairs, too
    * many to materialize for a row-by-row oracle compare, so both
    * engines reduce the pair set to (count, modular pair-hash sum)
    * INSIDE the engine and the gate compares two scalars. A pair
    * mismatch anywhere perturbs the sum (the hash mixes ids and the
    * overlap), so the scalar gate has the same evidentiary force as
    * the materialized compare without the 368M-row transfer.
    * Pure integer arithmetic, safe under ANSI: each reduced term
    * < 1e9, the weighted combination < ~1.01e15, and the outer sum
    * over even 10⁹ pairs stays < 2⁶³. */
  def intervalJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val m = 1000000007L
    val h = pmod(
      pmod(col("a_id"), lit(m)) * 1000003L +
        pmod(col("b_id"), lit(m)) * 7919L +
        pmod(col("overlap_us"), lit(m)), lit(m))
    intervalJoin(spark, dir)
      .agg(count(lit(1)).as("n_pairs"), sum(h).as("pair_hash"))
  }

  val intervalJoinSql: String =
    s"""WITH a AS (
       | SELECT event_id AS a_id, epoch_us(ts) AS s,
       |        epoch_us(ts) + ${intervalLenSec * 1000000L} AS e
       | FROM events WHERE event_type = 'purchase'),
       |b AS (
       | SELECT event_id AS b_id, epoch_us(ts) AS s,
       |        epoch_us(ts) + ${intervalLenSec * 1000000L} AS e
       | FROM events WHERE event_type = 'error')
       |SELECT a_id, b_id,
       |       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
       |FROM a, b WHERE a.s <= b.e AND b.s <= a.e""".stripMargin

  val intervalJoinAggSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       | CAST(sum(((a_id % 1000000007) * 1000003
       |   + (b_id % 1000000007) * 7919
       |   + (overlap_us % 1000000007)) % 1000000007) AS BIGINT) AS pair_hash
       |FROM ($intervalJoinSql) pairs""".stripMargin


  val rangeJoinSql: String =
    s"""SELECT e.event_id, e.user_id,
       | count(CASE WHEN c.ts >= e.ts - INTERVAL $rangeWindowSec SECOND
       |            AND c.ts < e.ts THEN 1 END) AS n_prior_clicks
       |FROM events e
       |LEFT JOIN events c
       |  ON c.user_id = e.user_id AND c.event_type = 'click'
       |WHERE e.event_type = 'error'
       |GROUP BY e.event_id, e.user_id""".stripMargin
}
