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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df0 = if (name == "events") {
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
    df0
  }

  /** SCAN FAN-OUT (r17, optimization-guide §2.5 "input skew: one huge
    * unsplittable file"): a single-row-group parquet file scans as ONE
    * task no matter the core count — Spark's parquet splits assign a
    * row group to the byte range holding its midpoint — so every
    * map-side kernel hanging off the scan (tokenize/explode, signature
    * kernels, distance evaluations) runs serially. Measured before the
    * fix at sf0.1: ann_pq 4.8 s at local[32] vs 4.4 s at local[4] —
    * the suite's kernel-heavy queries did not scale with cores AT ALL
    * because their first stage was one task.
    *
    * The fix is SCALE-ADAPTIVE, not a local constant: repartition the
    * scan to the cluster's default parallelism ONLY for the DEGENERATE
    * layout — a single scan partition, i.e. zero parallelism. Any
    * multi-split input keeps its natural parallelism (measured: fanning
    * a ~10-split sf10 embeddings scan cost ann_pq ~10% — the shuffle
    * bought nothing the splits didn't already give), and at deployment
    * scale the condition is never true, so no shuffle is ever added;
    * for any production table collapsed into one unsplittable file the
    * one cheap shuffle of the raw rows unlocks every core for all
    * downstream map-side work.
    * Row-to-partition assignment stays deterministic under retries
    * (sortBeforeRepartition is on by default, SPARK-23207); no
    * operator in the library is partitioning-sensitive (fixed-point /
    * integer aggregates by design).
    *
    * OPT-IN per operator, not blanket: for scan-speed map-only queries
    * (header decodes, quality projections, filter+partial-agg plans)
    * the serial scan IS the whole query and the added exchange only
    * taxes it — measured q1_agg 0.18 → 0.58 s under a blanket fan-out
    * while dedup_spans went 4.1 → 1.2 s. Operators whose per-row
    * kernels dominate call [[fanned]]; everything else keeps the bare
    * scan.
    *
    * The raw scan partition count is cached per (dir, table): probing
    * it needs the physical plan of the bare scan, and re-planning per
    * call would tax every query's build. */
  def fanned(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = apply(spark, dir, name)
    val raw = scanParts.computeIfAbsent((dir, name),
      _ => Integer.valueOf(df.rdd.getNumPartitions))
    if (raw == 1) df.repartition(spark.sparkContext.defaultParallelism) else df
  }

  /** [[fanned]] for an already-derived frame (same rule, no partition-
    * count cache — callers are once-per-query roots). */
  def fanOut(spark: SparkSession, df: DataFrame): DataFrame =
    if (df.rdd.getNumPartitions == 1)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df

  private val scanParts =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Integer]()
}
