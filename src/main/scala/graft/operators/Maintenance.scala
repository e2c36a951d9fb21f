package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table maintenance — the housekeeping that keeps a 100 TB parquet
  * lake queryable. Streaming sinks and incremental appends (the
  * file-per-window sink, the minhash index updates, any
  * foreachBatch writer) accrete small files; scans then pay a
  * per-file open/footer cost that dwarfs the data read, and
  * unclustered layout defeats min/max row-group skipping. Both jobs
  * here are plain DataFrame programs: the writes are distributed,
  * only file METADATA (a directory listing — dimension-sized, the
  * same listing every Spark scan performs) touches the driver.
  */
object Maintenance {

  /** Rewrite a parquet directory into ~`targetBytes`-sized files.
    * Target file count = ceil(input bytes / targetBytes), derived from
    * a RECURSIVE source listing via the Hadoop FileSystem API
    * (HDFS/S3-correct, not java.io; recursion so a nested layout's
    * bytes are counted, not silently missed). `shuffle = true`
    * (default) repartitions for even output sizes; `false` coalesces —
    * no shuffle, but output files inherit input skew AND the count
    * only caps (coalesce cannot split partitions), the classic
    * compaction trade. Returns the file count actually written (may be
    * below the target in coalesce mode). This rewrite flattens
    * partition columns out of the directory structure — compact a
    * HIVE-PARTITIONED table with [[compactPartitioned]] instead. */
  def compactTable(spark: SparkSession, srcDir: String, dstDir: String,
                   targetBytes: Long = 128L << 20,
                   shuffle: Boolean = true): Int = {
    val fs = new org.apache.hadoop.fs.Path(srcDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetBytes(dir: String): Long = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) total += f.getLen
      }
      total
    }
    val bytes = parquetBytes(srcDir)
    require(bytes > 0, s"no parquet data under $srcDir")
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val src = spark.read.parquet(srcDir)
    val out = if (shuffle) src.repartition(parts) else src.coalesce(parts)
    out.write.mode("overwrite").parquet(dstDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(dstDir))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Partition-aware compaction: rewrite EACH Hive partition directory
    * of a partitioned table into ~`targetBytes` files, preserving the
    * `col=value` directory layout (so partition pruning — the reason
    * the layout exists — keeps working on the compacted copy). This is
    * the one-call compaction for the library's own partitioned
    * producers: the file-per-window sink (one dir per window) and the
    * kb-partitioned sink tables / index `ids`, all of which accrete a
    * file per trigger. Walks nested `a=1/b=2/…` levels to the leaf
    * data directories; a leaf with no parquet (e.g. only a marker
    * file) is skipped, not an error. The per-partition rewrites run
    * as successive Spark jobs — the loop is over partition COUNT
    * (dimension-sized metadata, like the listing every scan does),
    * never over rows. Returns total files written. */
  def compactPartitioned(spark: SparkSession, srcDir: String, dstDir: String,
                         targetBytes: Long = 128L << 20,
                         shuffle: Boolean = true): Int = {
    val fs = new org.apache.hadoop.fs.Path(srcDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify the root the same way listStatus qualifies its results —
    // a RELATIVE srcDir would otherwise never prefix-match the
    // returned absolute leaf paths and the partition dirs would be
    // recreated under dstDir/<absolute-src-path>/, an unreadable tree
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(srcDir))
    def leafDirs(dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val parts = fs.listStatus(dir)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (parts.isEmpty) Seq(dir) else parts.toSeq.flatMap(p => leafDirs(p.getPath))
    }
    def hasParquet(dir: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(dir).exists(f => !f.isDirectory && f.getPath.getName.endsWith(".parquet"))
    val rootUri = root.toUri.getPath
    leafDirs(root).filter(hasParquet).map { leaf =>
      val rel = fs.makeQualified(leaf).toUri.getPath
        .stripPrefix(rootUri).stripPrefix("/")
      val dst = if (rel.isEmpty) dstDir else s"$dstDir/$rel"
      compactTable(spark, leaf.toString, dst, targetBytes, shuffle)
    }.sum
  }

  /** Range-clustered rewrite: `repartitionByRange` on the cluster key
    * then an in-partition sort, so every output file covers a DISJOINT
    * key range and its parquet min/max footer stats actually prune —
    * a range-predicate scan opens only the files whose range overlaps
    * the predicate instead of every file (the layout half of data
    * skipping; the scan half is free in every parquet reader). The
    * sort is by the cluster key alone — secondary sort columns would
    * tighten other columns' row-group stats at the cost of a wider
    * sort key; add them per workload. */
  def clusterBy(spark: SparkSession, srcDir: String, dstDir: String,
                key: String, files: Int): Unit =
    spark.read.parquet(srcDir)
      .repartitionByRange(files, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(dstDir)
}
