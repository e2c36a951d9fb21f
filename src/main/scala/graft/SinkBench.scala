package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-sink cost curve — the measurement seat for the sinks'
  * bounded idempotency contract (the SkewBench idiom: make the design
  * claim a number). Streams the ~10% incoming-batch document slice
  * through [[graft.streaming.Pipelines.incrementalDedupSink]] in many
  * small triggers and records per-trigger wall times from the engine's
  * progress events. Every trigger grows the pair table and the index,
  * so an O(history) per-trigger key check would show a climbing tail;
  * the kb-bucket-pruned checks keep per-trigger work bounded by batch
  * size — the pass condition is a flat (or JIT-declining) tail:
  * last-10-trigger mean ≤ ~first-10 mean.
  *
  * `sbt "runMain graft.SinkBench [sfDir] [outFile] [triggers]"` →
  * one JSON line (stdout + artifact), the Bench convention.
  */
object SinkBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outFile = args.lift(1).getOrElse("sink-bench.json")
    val triggers = args.lift(2).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // recentProgress defaults to 100 retained entries — a longer run
      // would silently drop its EARLIEST triggers and bias first10
      // toward the warmed middle, hiding exactly the climbing tail
      // this bench exists to detect
      .config("spark.sql.streaming.numRecentProgressUpdates",
        (triggers + 64).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toFile.getAbsolutePath

    // index over the corpus minus the streamed slice (the spec setup)
    val idx = tmp("graft-sinkbench-idx")
    operators.DedupOps.incrementalIndexBuild(spark, sfDir, idx,
      docFilter = pmod(col("doc_id"), lit(10)) =!= 7)
    val slice = Tables(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(10)) === 7)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val broker = tmp("graft-sinkbench-broker")
    sources.GraftQueueBroker.publish(broker, "docs", slice.map { case (id, text) =>
      sources.GraftQueueBroker.textMsg(
        id, 1700000000000000L + id * 1000L, "t/docs/0", text)
    })

    val table = tmp("graft-sinkbench-table")
    val per = math.max(1L, slice.length.toLong / triggers)
    val msgs = streaming.Pipelines.readQueues(
      spark, broker, Seq("docs"), maxRecordsPerTrigger = Some(per))
    val q = streaming.Pipelines.incrementalDedupSink(msgs, idx, table)
      .option("checkpointLocation", tmp("graft-sinkbench-ckpt")).start()
    try q.processAllAvailable() finally q.stop()

    val durs = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .sortBy(_.batchId)
      .map(p => p.batchId -> p.durationMs.get("triggerExecution").toLong)
    // ≥ 21 post-warmup triggers so the head and tail windows are
    // DISJOINT — an overlapping trigger counted in both means biases
    // the ratio toward the flat 1.0 this bench is supposed to earn
    require(durs.size >= 22, s"only ${durs.size} data triggers — raise the trigger count")
    def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    // drop the first trigger (cold JVM + first-write table setup)
    val body = durs.drop(1).map(_._2)
    val first = mean(body.take(10))
    val last = mean(body.takeRight(10))
    def f(v: Double): String =
      java.lang.String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val line =
      s"""{"metric":"sink_trigger_ms","sf":"$sfDir","triggers":${durs.size},""" +
        s""""rows_per_trigger":$per,"first10_mean":${f(first)},""" +
        s""""last10_mean":${f(last)},"ratio":${f(last / first)},""" +
        s""""per_trigger":[${durs.map(_._2).mkString(",")}]}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[sinkbench] artifact write failed: $e") }
    spark.stop()
  }
}
