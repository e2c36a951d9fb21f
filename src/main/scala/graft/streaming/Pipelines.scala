package graft.streaming

import graft.functions.Texts
import graft.model.{GraftBytesRecord, GraftTextRecord}
import graft.sources.GraftQueueSource
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQueryListener}
import org.apache.spark.sql.Row

/** Streaming pipelines over the graft queue source — the Spark
  * re-expression of the reference's sample pipelines:
  *  - message mappers ≙ InboundMessageMapper / StringMessageMapper
  *    (solace-apache-beam-samples/.../common/StringMessageMapper.java),
  *    except they are Catalyst projections producing typed Datasets;
  *  - windowedWordCount ≙ WindowedWordCountSolace.java:120-150
  *    (fixed windows + CountWords), with an event-time watermark on
  *    the sender timestamp (the useSenderTimestamp option);
  *  - fileSinkPerWindow ≙ common/WriteOneFilePerWindow.java — one
  *    parquet directory partition per window via partitionBy;
  *  - QueueStatsListener ≙ SolaceReaderStats.java — per-batch row /
  *    backlog accounting surfaced through the engine's listener bus.
  */
object Pipelines {

  /** readStream from the queue broker (SolaceIO.read equivalent). */
  def readQueues(
      spark: SparkSession,
      brokerDir: String,
      queues: Seq[String],
      maxRecordsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format(GraftQueueSource.FORMAT)
      .option("brokerDir", brokerDir)
      .option("queues", queues.mkString(","))
    maxRecordsPerTrigger.foreach(n => r.option("maxRecordsPerTrigger", n.toString))
    r.load()
  }

  /** Bounded (batch) read of the same queues — maxNumRecords mode. */
  def readQueuesBounded(
      spark: SparkSession,
      brokerDir: String,
      queues: Seq[String],
      maxNumRecords: Option[Long] = None): DataFrame = {
    val r = spark.read
      .format(GraftQueueSource.FORMAT)
      .option("brokerDir", brokerDir)
      .option("queues", queues.mkString(","))
    maxNumRecords.foreach(n => r.option("maxNumRecords", n.toString))
    r.load()
  }

  /** StringMessageMapper: payload bytes → UTF-8 text. */
  def mapToText(messages: DataFrame): Dataset[String] = {
    import messages.sparkSession.implicits._
    messages.select(col("payload").cast("string")).as[String]
  }

  /** SolaceTextRecord mapper: full metadata + text payload. */
  def mapToTextRecord(messages: DataFrame): Dataset[GraftTextRecord] = {
    import messages.sparkSession.implicits._
    messages.select(
      col("queue"), col("destination"), col("message_id"),
      col("sender_ts"), col("receive_ts"), col("priority"),
      col("redelivered"), col("reply_to"), col("sequence_number"),
      col("time_to_live"), col("payload").cast("string").as("text"))
      .as[GraftTextRecord]
  }

  /** SolaceByteBuffRecord mapper: raw bytes view. */
  def mapToBytes(messages: DataFrame): Dataset[GraftBytesRecord] = {
    import messages.sparkSession.implicits._
    messages.select(col("queue"), col("message_id"), col("payload")).as[GraftBytesRecord]
  }

  /** Fixed-window word count over message text with an event-time
    * watermark on the chosen timestamp (sender_ts ↔ useSenderTimestamp,
    * receive_ts otherwise). Works on both batch and streaming frames. */
  def windowedWordCount(
      messages: DataFrame,
      windowLength: String = "1 minute",
      useSenderTimestamp: Boolean = true,
      watermark: String = "2 minutes"): DataFrame = {
    val tsCol = if (useSenderTimestamp) "sender_ts" else "receive_ts"
    val withTs =
      if (messages.isStreaming) messages.withWatermark(tsCol, watermark) else messages
    withTs
      .select(col(tsCol).as("ts"), col("payload").cast("string").as("text"))
      .select(col("ts"), explode(Texts.tokens(col("text"))).as("word"))
      .groupBy(window(col("ts"), windowLength), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("word"), col("cnt"))
  }

  /** WriteOneFilePerWindow: append parquet partitioned by window start
    * so each window lands in its own directory partition. */
  def fileSinkPerWindow(counts: DataFrame, outDir: String): DataStreamWriter[Row] =
    counts
      .withColumn("window_part", date_format(col("ws"), "yyyyMMdd_HHmmss"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", outDir + "/_checkpoint")
      .partitionBy("window_part")

  /** SolaceReaderStats equivalent: accumulate per-batch input rows and
    * batch count from the streaming listener bus. */
  class QueueStatsListener extends StreamingQueryListener {
    @volatile var batches: Long = 0L
    @volatile var totalRows: Long = 0L
    @volatile var maxBatchRows: Long = 0L

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val rows = e.progress.numInputRows
      if (rows > 0) {
        batches += 1
        totalRows += rows
        maxBatchRows = math.max(maxBatchRows, rows)
      }
    }
  }
}
