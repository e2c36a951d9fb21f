package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the physical plans we designed for must
  * stay the plans Catalyst picks. A wrong plan is a performance bug
  * even when results match — at 100 TB these properties are the
  * difference between one shuffle and a catastrophe.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = SparkSpec.sf

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Whole-stage codegen only shows in the FINAL adaptive plan (AQE
    * replans at runtime) — execute, then read the `*(n)` stars. */
  private def codegenPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q6: all predicates push down to the parquet scan, schema pruned") {
    val p = plan(operators.Relational.q6Filter(spark, sf))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("l_shipdate"), "shipdate filter must reach the scan")
    // only the 4 referenced columns are read, not all 10+
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), s"column pruning lost: $readSchema")
    assert(readSchema.contains("l_extendedprice"))
  }

  test("q3/q5: dimension joins broadcast, no shuffle of dims") {
    val p3 = plan(operators.Relational.q3Join(spark, sf))
    assert(p3.contains("BroadcastHashJoin"), "customer join must broadcast")
    val p5 = plan(operators.Relational.q5MultiJoin(spark, sf))
    assert(p5.contains("BroadcastHashJoin"))
    assert(!p5.contains("CartesianProduct"))
  }

  test("q1: hash aggregation with map-side partial aggregate") {
    val p = plan(operators.Relational.q1Agg(spark, sf))
    assert(p.contains("HashAggregate"))
    assert(p.split("HashAggregate").length >= 3, "expect partial+final HashAggregate")
    assert(codegenPlan(operators.Relational.q1Agg(spark, sf)).contains("*("),
      "q1 must stay inside whole-stage codegen")
  }

  test("topic_route: custom predicate stays inside codegen broadcast join") {
    val df = operators.EventOps.topicRoute(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(codegenPlan(df).contains("*("))
  }

  test("dedup_minhash: signature aggregation is a single shuffle (partial min)") {
    val p = plan(operators.DedupOps.minhashLsh(spark, sf))
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }

  test("pure-LSH minhash drops the inverted-index subtree: strictly fewer shuffles") {
    // the point of the scale mode — candidate enumeration is the band
    // join alone, so the prefix explode + self-join exchanges vanish
    def shuffles(df: DataFrame): Int =
      "\\(\\d+\\) Exchange".r.findAllIn(plan(df)).length
    val gate = shuffles(operators.DedupOps.minhashLsh(spark, sf))
    val pure = shuffles(operators.DedupOps.minhashLsh(spark, sf, exactRecallUnion = false))
    assert(pure < gate, s"pure-LSH plan should shed shuffles: gate=$gate pure=$pure")
  }

  test("dedup: the per-doc shingle aggregate is computed once and reused") {
    // signatures, prefix index, and exact verify all derive from the
    // SAME docSets subplan — the physical plan must reuse that
    // exchange, not re-run the scan+shingling+df-cap per consumer
    val mh = operators.DedupOps.minhashLsh(spark, sf)
    mh.collect()
    val pm = mh.queryExecution.executedPlan.toString
    assert(pm.contains("ReusedExchange"),
      "minhash plan re-computes the shared shingle aggregate")
    val nj = operators.DedupOps.ngramJaccard(spark, sf)
    nj.collect()
    assert(nj.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "ngram-jaccard plan re-computes the shared shingle aggregate")
    val ct = operators.DedupOps.containment(spark, sf)
    ct.collect()
    assert(ct.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "containment plan re-computes the shared shingle aggregate")
  }

  test("doc_repetition runs at scan speed: zero exchanges in the plan") {
    // the top-word count is a sorted-run fold on the token array, not
    // an explode + two-level aggregate — nothing may shuffle
    val p = plan(operators.TextOps.docRepetition(spark, sf))
    assert(!p.contains("Exchange"),
      s"doc_repetition must be map-side only:\n${p.take(1500)}")
  }

  test("source_quality_report reuses the near-dup subtree's shingle exchange") {
    // the report embeds ngramJaccard for its near-dup flag; that
    // subtree's shared docSets aggregate must be planned once and
    // reused, not recomputed per consumer (same pin as the dedup ops)
    val df = operators.TextOps.sourceQualityReport(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "report re-computes the near-dup flag's shared shingle aggregate")
  }

  test("source_jaccard: corpus gram shuffle planned once (reused exchange); " +
    "kmv mode is join-free") {
    // the sizes branch (diagonal rows) and the pair branch both hang
    // off the per-gram collect_set aggregate; the consumer filters
    // cannot push below the combo Generate, so the corpus-scale
    // Exchange(g) subtree is identical in both and AQE must reuse it
    // — "set sizes ride the same aggregate" is this pin, not a comment
    val df = operators.DedupOps.sourceJaccard(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "source_jaccard re-shuffles the corpus for the size branch")
    // the sketch mode generates pairs by in-row transforms over ONE
    // collected row — no join operator of any kind may appear
    val pk = plan(operators.DedupOps.sourceJaccardKmv(spark, sf))
    assert(!pk.contains("Join"), s"kmv pair generation must be join-free:\n${pk.take(1200)}")
  }

  test("wordcount & windowed wordcount stay in whole-stage codegen") {
    assert(codegenPlan(operators.TextOps.wordCount(spark, sf)).contains("*("))
    assert(codegenPlan(operators.TextOps.windowedWordCount(spark, sf)).contains("*("))
  }

  test("dedup_embedding: block-pair equi-join, no corpus broadcast nested loop") {
    val p = plan(operators.VectorOps.embeddingNearDup(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "exact pair join must not broadcast the corpus into a nested loop")
    assert(!p.contains("CartesianProduct"))
    // any equi-join form is fine (tiny test inputs auto-broadcast into a
    // BroadcastHashJoin; at scale AQE picks sort-merge/shuffled-hash on
    // the task key) — the forbidden shape is the nested loop above.
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      "pair enumeration must be an equi-join on the block-task key")
  }

  test("centroid means aggregate with bounded state (no per-group collect of coordinates)") {
    // the unbounded pattern was collect_list over the exploded
    // per-coordinate column `x` — sum/count must have replaced it.
    // (The bounded 64-element per-label assembly collect is fine.)
    val unbounded = "collect_list\\(x#\\d".r
    val pKnn = plan(operators.VectorOps.knnCentroid(spark, sf))
    assert(unbounded.findFirstIn(pKnn).isEmpty,
      "knn_centroid still collects raw coordinates per group")
    val pIvf = plan(operators.VectorOps.annIvf(spark, sf))
    assert(unbounded.findFirstIn(pIvf).isEmpty,
      "ann_ivf still collects raw coordinates per group")
  }

  test("range join is an equi-join on bucket keys, not a time-range nested loop") {
    val p = plan(operators.TemporalJoins.rangeJoin(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join must bucket, not nested-loop the time condition")
  }

  test("no query in the library plans a CartesianProduct") {
    // broadcast nested loops over a provably tiny side (query sets,
    // 1-row aggregates, centroid tables) are fine; an unbroadcast
    // cartesian over two big inputs never is
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = plan(fn(spark, sf))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("dynamic partition pruning: a dim predicate prunes the date-partitioned fact scan") {
    // The 100 TB layout: the events fact is laid out date-partitioned;
    // a query that joins it to a dim filtered on a NON-date attribute
    // must still only read the matching date partitions — Spark
    // injects a runtime `dynamicpruning` subquery into the scan's
    // partition filters from the broadcast side. Static pruning can't
    // do this (the qualifying dates aren't known until the dim is
    // evaluated), and without DPP the query scans every partition.
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-dpp").toFile.getAbsolutePath
    val ev = Tables(spark, sf, "events").withColumn("event_date", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("event_date")
      .parquet(s"$base/events_by_date")
    // dim as a parquet table so its filter is a genuine runtime
    // predicate over stored data, not a foldable literal list
    ev.select(to_date(col("ts")).as("d")).distinct()
      .withColumn("label",
        when(dayofmonth(col("d")) % 7 === 0, "audit").otherwise("normal"))
      .write.mode("overwrite").parquet(s"$base/date_dim")
    val fact = spark.read.parquet(s"$base/events_by_date")
    val dim = spark.read.parquet(s"$base/date_dim").filter(col("label") === "audit")
    val q = fact.join(dim, fact("event_date") === dim("d"))
      .groupBy(col("event_date")).agg(count(lit(1)).as("n"))
    val p = plan(q)
    assert(p.contains("dynamicpruning"),
      s"fact scan lacks a dynamic partition pruning filter:\n${p.take(2000)}")
    // and the pruned query still computes the right answer
    val expected = ev.filter(dayofmonth(to_date(col("ts"))) % 7 === 0)
      .groupBy(to_date(col("ts")).as("event_date")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val got = q.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    // the 100 TB recipe for repeated fact⋈fact joins: bucket both
    // sides on the join key at write time, the join then needs no
    // Exchange at read time
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toFile.getAbsolutePath
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$wh'")
    // tiny test tables would auto-broadcast and hide the bucketing —
    // disable it so the sort-merge path (what a fact⋈fact join uses
    // at scale) is exercised
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k =>
        k -> spark.conf.getOption(k))
    saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
    try {
      operators.Bucketing.writeBucketed(
        Tables(spark, sf, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice"),
        "graft_bkt.li_b", "l_orderkey", buckets = 8)
      operators.Bucketing.writeBucketed(
        Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        "graft_bkt.ord_b", "o_orderkey", buckets = 8)
      val joined = operators.Bucketing.coLocatedJoin(
        spark, "graft_bkt.li_b", "graft_bkt.ord_b", "l_orderkey", "o_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${p.take(1500)}")
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    }
  }
}
