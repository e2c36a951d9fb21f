package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-generated TPC-H-ish testdata.
  *
  * All operators take `(SparkSession, sfDir)` and load through here so
  * that projection/filter pushdown applies to the raw parquet scan
  * (no caching layer in between — Catalyst sees the file source).
  *
  * `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's
  * parquet reader rejects; we read it with
  * `spark.sql.legacy.parquet.nanosAsLong` and convert to a
  * microsecond timestamp (`timestamp_micros(ns div 1000)`), which is
  * exactly what DuckDB produces when it reads the same file (its
  * TIMESTAMP is µs, ns are truncated) — so oracle comparisons on
  * event timestamps are bit-equal.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Collision-resistant key for per-data-dir cached artifacts (tmp
    * IVF indexes, pipeline shards): readable sanitized path plus a
    * hash of the raw string — sanitizing alone maps dirs differing
    * only in punctuation ('/d/sf0-1' vs '/d/sf0_1') to the same key
    * and silently cross-wires their outputs. String.hashCode is
    * spec-fixed, so keys are stable across JVMs. */
  def dirKey(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9.]", "_") + "-" +
      java.lang.Integer.toHexString(dir.hashCode)

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
