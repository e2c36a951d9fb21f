package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-generated TPC-H-ish testdata.
  *
  * All operators take `(SparkSession, sfDir)` and load through here so
  * that projection/filter pushdown applies to the raw parquet scan
  * (no caching layer in between — Catalyst sees the file source).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
