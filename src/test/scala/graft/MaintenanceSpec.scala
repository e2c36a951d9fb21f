package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table maintenance: compaction sizes its output from the source
  * listing and preserves the rows; range clustering produces files
  * with disjoint key ranges (the min/max-skipping precondition). */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = SparkSpec.sf

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def parquetFiles(dir: String) =
    new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))

  test("compactTable merges small files to the target size, rows intact") {
    val small = tmp("graft-small")
    Tables(spark, sf, "events").repartition(64).write.mode("overwrite").parquet(small)
    assert(parquetFiles(small).length === 64)

    val compacted = tmp("graft-compact")
    val totalBytes = parquetFiles(small).map(_.length).sum
    val target = totalBytes / 3 // expect ceil(3-ish) output files
    val parts = operators.Maintenance.compactTable(spark, small, compacted, target)
    assert(parts === math.ceil(totalBytes.toDouble / target).toInt)
    assert(parquetFiles(compacted).length === parts)
    assert(parts < 64)

    def ids(dir: String) = spark.read.parquet(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(compacted) === ids(small))

    // coalesce mode: same rows, no shuffle in the plan
    val co = tmp("graft-compact-co")
    operators.Maintenance.compactTable(spark, small, co, target, shuffle = false)
    assert(ids(co) === ids(small))
  }

  test("clusterBy yields files with disjoint key ranges that a range scan can skip") {
    val src = tmp("graft-unclustered")
    // scramble so the unclustered layout has overlapping ranges
    Tables(spark, sf, "events").orderBy(hash(col("event_id")))
      .coalesce(8).write.mode("overwrite").parquet(src)

    val dst = tmp("graft-clustered")
    operators.Maintenance.clusterBy(spark, src, dst, "event_id", 8)

    def ranges(dir: String) = parquetFiles(dir).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("event_id")), max(col("event_id"))).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)

    val clustered = ranges(dst)
    clustered.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, "clustered file ranges must be disjoint")
      case _ =>
    }
    // the scrambled source, by contrast, has every file spanning ~the
    // whole id range — the layout clusterBy exists to fix
    val unclustered = ranges(src)
    assert(unclustered.exists { case (lo, hi) => hi - lo > (clustered.head._2 - clustered.head._1) * 2 },
      "scrambled layout should have wide overlapping ranges")

    // rows preserved
    assert(spark.read.parquet(dst).count() === spark.read.parquet(src).count())
  }
}
