package graft

import java.nio.file.Files

import graft.sources.GraftQueueBroker
import graft.streaming.Pipelines
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full reference pipeline shape, end to end: the events table is
  * spooled into broker queues (what Solace ingests), streamed through
  * the connector, windowed per event type, and the result must equal
  * the batch tumbling aggregation over the original parquet —
  * ingest ≡ analytics, the SolaceBigQuery sample's contract.
  */
class EndToEndSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sf = SparkSpec.sf

  test("events -> broker spool -> stream -> window == batch tumbling_agg") {
    val broker = Files.createTempDirectory("graft-broker").toFile.getAbsolutePath
    val nQueues = 4

    // Spool: one queue per user shard, messages carry the event type
    // as payload and the event time as sender timestamp.
    val events = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .collect() // sf0.001 = 1k rows; test-only driver-side spooling
    events.groupBy(r => (r.getLong(1) % nQueues).toInt).foreach { case (shard, rows) =>
      GraftQueueBroker.publish(broker, s"events-$shard", rows.toSeq.map { r =>
        GraftQueueBroker.textMsg(r.getLong(0), r.getLong(2), s"events/${r.getString(3)}",
          r.getString(3))
      })
    }

    val queues = (0 until nQueues).map(i => s"events-$i")
    val counts = Pipelines.windowedWordCount(
      Pipelines.readQueues(spark, broker, queues), windowLength = "1 hour")
    val q = counts.writeStream.format("memory").queryName("e2e")
      .outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt").toFile.getAbsolutePath)
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("e2e").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = operators.EventOps.tumblingAgg(spark, sf)
      .select(col("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed === batch,
      "streamed windowed counts must equal the batch tumbling aggregation")
    assert(streamed.nonEmpty)
  }
}
