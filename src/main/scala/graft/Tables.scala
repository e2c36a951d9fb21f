package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-generated TPC-H-ish testdata.
  *
  * All operators take `(SparkSession, sfDir)` and load through here so
  * that projection/filter pushdown applies to the raw parquet scan
  * (no caching layer in between — Catalyst sees the file source).
  *
  * `events.parquet`'s `ts` column has shipped in two physical layouts
  * across testdata generations, both normalized here to a session-tz
  * µs TIMESTAMP so every operator (and the DuckDB oracle, whose
  * TIMESTAMP is naive µs read under the same UTC session) sees
  * identical values:
  *  - INT64 TIMESTAMP(NANOS), which Spark's parquet reader rejects —
  *    read with `spark.sql.legacy.parquet.nanosAsLong` and converted
  *    via `timestamp_micros(ns div 1000)` (DuckDB truncates ns → µs
  *    the same way);
  *  - native TIMESTAMP(MICROS) without UTC adjustment, which Spark
  *    reads as TIMESTAMP_NTZ — cast to TIMESTAMP (UTC session: same
  *    wall clock, same instant).
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

  /** Content stamp of a file tree for cache freshness (tmp index
    * caches keyed by data dir + this): per-file terms fold the NAME
    * with length and mtime, chained with a non-commutative mix over
    * name-sorted children — a plain XOR of length^mtime is order- and
    * multiplicity-insensitive (two part files with equal stats cancel
    * to 0), so a regenerated dir could collide with its old stamp and
    * silently serve a stale index. */
  def contentStamp(f: java.io.File): Long =
    if (f.isFile)
      (f.getName.hashCode.toLong * 1315423911L) ^
        java.lang.Long.rotateLeft(f.length, 17) ^ f.lastModified
    else if (f.isDirectory) {
      // listFiles returns null for a dir deleted/unreadable between
      // the isDirectory check and the walk — treat as empty, same as
      // a missing path, rather than NPE inside cache-key computation
      val kids0 = f.listFiles()
      if (kids0 == null) 0L
      else {
        val kids = kids0.sortBy(_.getName)
        kids.foldLeft(kids.length.toLong)((acc, x) => acc * 31L ^ contentStamp(x))
      }
    } else 0L

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
