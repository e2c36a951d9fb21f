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
    // snapshot-resolved: compacting a manifest-managed store into a
    // fresh dir must copy the LIVE rows only (a raw dir read would
    // also copy retired files awaiting GC); plain dirs read unchanged
    val src = Snapshot.read(spark, srcDir)
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

  /** Size-tiered IN-PLACE compaction for APPEND-ONLY parquet stores —
    * the LSM answer to per-trigger file accretion. A streaming sink
    * appends a handful of files per trigger; after T triggers every
    * scan (and every scan's directory LISTING) pays O(T) file opens,
    * which is exactly the climbing per-trigger tail SinkBench exists
    * to catch. Rewriting the whole store per maintenance pass would
    * bound the file count but cost O(corpus) each time — unpayable at
    * scale. This instead merges only the SMALLEST files: when the dir
    * holds more than `maxFiles` parquet files, the smallest
    * `n - maxFiles/2 + 1` are read once and rewritten as ONE file
    * (count drops to maxFiles/2 — the hysteresis keeps merges
    * infrequent; a single call's merge set is additionally capped at
    * `maxMergeFiles` — the first compaction of a long-accreted store,
    * or one run with maintenance previously off, would otherwise
    * rewrite nearly every file single-threaded inside one streaming
    * trigger, so the cap bounds each invocation's stall and repeated
    * per-trigger calls converge to the threshold within a few
    * triggers). Smallest-first is the size-tiered discipline: fresh
    * per-trigger deltas merge into a growing run, the run graduates
    * out of the "smallest" set as it grows, so each row is rewritten
    * O(log) times over the store's life — never a full rewrite, cost
    * amortizes to O(rows appended), independent of corpus size.
    *
    * Crash contract (single writer per store, as with every unmanaged
    * index dir): the merged file is written under a `_`-prefixed temp
    * dir (hidden from every parquet reader), renamed in, and only
    * then are the source files deleted. A crash before the rename
    * leaves an ignored temp dir (swept on the next call); a crash
    * after it leaves DUPLICATE rows — the same window a replayed
    * append already leaves, and the reason this op composes only with
    * duplicate-tolerant stores (the minhash index's probe dedups by
    * doc_id, candidate pairs are distinct, `ids` feeds anti-joins;
    * the IVF search paths collapse duplicate candidates).
    *
    * CONCURRENT-READER contract: the rename-then-delete window means a
    * reader in ANOTHER process that listed files before a merge can
    * hit FileNotFoundException when the sources are deleted mid-scan.
    * In-process readers are safe (each Spark action re-lists), but a
    * separate serving process must not share a store with THIS
    * compactor. For stores that are served while maintained, use
    * [[Snapshot.compactTiered]] instead: same merge policy, but
    * commits go through generation manifests and retired sources
    * outlive a grace window, so a pinned [[Snapshot.read]] snapshot
    * stays valid under live compaction (the sinks default to it).
    *
    * Returns the number of files merged away (0 = under threshold,
    * no-op). */
  def compactTiered(spark: SparkSession, dir: String, maxFiles: Int = 128,
                    maxMergeFiles: Int = 512): Int = {
    require(maxFiles >= 2, s"maxFiles must be >= 2, got $maxFiles")
    require(maxMergeFiles >= 2, s"maxMergeFiles must be >= 2, got $maxMergeFiles")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    // a manifest-managed store (every index the staged builders write,
    // any store the snapshot compactor has touched) must be maintained
    // through [[Snapshot.compactTiered]]: this compactor's tier output
    // would look like an UNCOMMITTED tier file to snapshot resolution
    // (rows silently vanish) and its source deletions would fail the
    // manifest's lost-live-file check — refuse loudly instead
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_manifests")),
      s"$dir is a snapshot-managed store — use Snapshot.compactTiered " +
        "(in-place compaction would corrupt manifest resolution)")
    // sweep temp dirs a crashed previous call left behind
    fs.listStatus(root).foreach { s =>
      if (s.isDirectory && s.getPath.getName.startsWith("_compact_tmp"))
        fs.delete(s.getPath, true)
    }
    val files = fs.listStatus(root)
      .filter(s => !s.isDirectory && s.getPath.getName.endsWith(".parquet"))
    if (files.length <= maxFiles) return 0
    val merge = files
      .sortBy(s => (s.getLen, s.getPath.getName))
      .take(math.min(files.length - maxFiles / 2 + 1, maxMergeFiles))
    val tmp = new org.apache.hadoop.fs.Path(root,
      "_compact_tmp-" + java.util.UUID.randomUUID().toString)
    spark.read.parquet(merge.map(_.getPath.toString).toIndexedSeq: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .find(s => s.getPath.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"merge wrote no parquet under $tmp"))
    val dst = new org.apache.hadoop.fs.Path(root,
      "tier-" + java.util.UUID.randomUUID().toString + ".parquet")
    if (!fs.rename(part.getPath, dst))
      throw new IllegalStateException(s"rename ${part.getPath} -> $dst failed")
    merge.foreach(s => fs.delete(s.getPath, false))
    fs.delete(tmp, true)
    merge.length
  }

  /** [[compactTiered]] over every leaf of a Hive-partitioned tree
    * (the kb-bucketed `ids` / sink tables): each `col=value` leaf is
    * its own append-only store with its own threshold, so a merge
    * reads one bucket's small tier — never the sibling buckets —
    * and partition pruning keeps working on the merged layout. Leaves
    * under threshold cost one driver listing each (the same listing
    * every scan of the tree performs). Returns total files merged. */
  def compactTieredPartitioned(spark: SparkSession, dir: String,
                               maxFilesPerLeaf: Int = 16,
                               maxMergeFiles: Int = 512): Int = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    // snapshot-managed trees carry their manifest at the ROOT — the
    // per-leaf compactTiered guard would miss it
    require(!fs.exists(new org.apache.hadoop.fs.Path(root, "_manifests")),
      s"$dir is a snapshot-managed store — use " +
        "Snapshot.compactTieredPartitioned")
    def leafDirs(d: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val parts = fs.listStatus(d)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (parts.isEmpty) Seq(d) else parts.toSeq.flatMap(p => leafDirs(p.getPath))
    }
    leafDirs(root)
      .map(l => compactTiered(spark, l.toString, maxFilesPerLeaf, maxMergeFiles))
      .sum
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

  /** Z-ORDER clustered rewrite — the multi-column complement to
    * [[clusterBy]]: linear clustering makes the SECOND predicate
    * column useless (every file spans its full range), while
    * interleaving the two keys' bits puts rows close in BOTH
    * dimensions into the same files, so parquet min/max footers prune
    * range scans on either column (the Delta/Iceberg OPTIMIZE ZORDER
    * layout, here as a plain parquet rewrite).
    *
    * Each key is first scaled to a 16-bit bucket via its corpus
    * min/max — computed as a 1-row bounds aggregate broadcast back
    * onto the scan (in-plan, never a driver collect) — then the two
    * bucket numbers interleave bit-by-bit into a 32-bit z-value the
    * rewrite range-partitions and sorts on. Scaling by rank instead
    * of min/max would resist skew better but costs a full sort per
    * key; min/max matches what the footer-stats pruning consumes.
    * The z column is dropped before the write — the layout, not the
    * schema, carries the clustering. */
  def zOrderBy(spark: SparkSession, srcDir: String, dstDir: String,
               keyA: String, keyB: String, files: Int): Unit = {
    val df = spark.read.parquet(srcDir)
    // the bounds aliases share the `_z` reserved prefix with the
    // z-value column: an unprefixed name like `za_min` could collide
    // with a data column of the same name, making the bucket
    // expression ambiguous (and the final drop destructive)
    val bounds = df.agg(
      min(col(keyA)).cast("double").as("_z_bounds_a_min"),
      max(col(keyA)).cast("double").as("_z_bounds_a_max"),
      min(col(keyB)).cast("double").as("_z_bounds_b_min"),
      max(col(keyB)).cast("double").as("_z_bounds_b_max"))
    def bucket(key: String, mn: String, mx: String) =
      least(lit(65535L),
        floor((col(key).cast("double") - col(mn)) /
          greatest(col(mx) - col(mn), lit(java.lang.Double.MIN_NORMAL)) *
          lit(65536.0)).cast("bigint"))
    val za = bucket(keyA, "_z_bounds_a_min", "_z_bounds_a_max")
    val zb = bucket(keyB, "_z_bounds_b_min", "_z_bounds_b_max")
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(za, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(zb, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
    require(!df.columns.exists(_.startsWith("_z")),
      s"zOrderBy reserves the _z column-name prefix; $srcDir carries " +
        df.columns.filter(_.startsWith("_z")).mkString(", "))
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z", "_z_bounds_a_min", "_z_bounds_a_max",
        "_z_bounds_b_min", "_z_bounds_b_max")
      .write.mode("overwrite").parquet(dstDir)
  }
}
