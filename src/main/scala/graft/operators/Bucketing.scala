package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table utilities — the 100 TB recipe for repeated
  * fact⋈fact joins: pay one shuffle at WRITE time (bucketBy + sortBy
  * on the join key), then every subsequent join on that key needs no
  * Exchange at read time; Catalyst sees compatible output
  * partitionings on both sides and plans a shuffle-free
  * SortMergeJoin. PlanSpec pins the no-Exchange property.
  *
  * At cluster scale pick `buckets` ≈ target parallelism (hundreds to
  * thousands); tiny local tests use small counts. Both sides must use
  * the SAME bucket count or Spark re-shuffles the smaller one.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (one shuffle, paid
    * once). The table must live in a catalog database — path-based
    * parquet loses bucketing metadata. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys without a shuffle.
    * Forces the sort-merge path (a broadcastable side would hide the
    * bucketing locally; at fact⋈fact scale sort-merge is what runs). */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    // same-named keys (the common fact⋈fact case) use the USING form,
    // which coalesces the key into ONE output column — resolving per
    // side would only move the ambiguity from join time to the first
    // downstream reference
    val joined =
      if (leftKey == rightKey) l.join(r, Seq(leftKey))
      else l.join(r, l.col(leftKey) === r.col(rightKey))
    joined.hint("merge")
  }
}
