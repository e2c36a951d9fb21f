package graft

import graft.functions.BinRecord
import graft.sources.GraftQueueBroker
import graft.streaming.Pipelines
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** SQL function registration, the GR binary record codec/mapper, and
  * stateful exactly-once dedup over a redelivering broker. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("custom expressions callable from pure SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  topic_matches('events/*/u7', 'events/click/u7')  AS m1,
        |  topic_matches('events/>', 'events')              AS m2,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))    AS d,
        |  vec_dist_sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS dist,
        |  size(distinct_shingles3('a b c d'))              AS nsh,
        |  size(minhash_sig(distinct_shingles3('a b c d'))) AS nsig,
        |  simhash_sig(distinct_shingles3('a b c d'))       AS sim
        |""".stripMargin).collect()(0)
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
    assert(r.getDouble(2) === 11.0)
    assert(r.getDouble(3) === 25.0)
    assert(r.getInt(4) === 2)
    assert(r.getInt(5) === 128)
    // 2 shingles → every bit votes ±2 or 0; the sig is deterministic —
    // pin it against the kernel called directly
    val expected = {
      import org.apache.spark.sql.functions._
      import graft.functions.TextKernels.distinctShingles3
      spark.range(1).select(graft.functions.SimHashSigColumns.simhashSig(
        distinctShingles3(lit("a b c d"))).as("s")).collect()(0).getLong(0)
    }
    assert(r.getLong(6) === expected)
  }

  test("topk_structs: k-bounded heap aggregate callable from pure SQL") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT g, topk_structs(struct(v, -id), 2) AS top FROM VALUES
        |  (1, 10.0D, 101L), (1, 30.0D, 103L), (1, 20.0D, 102L),
        |  (1, 30.0D, 104L), (2, 5.0D, 201L)
        |  AS t(g, v, id)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    // group 1: two ties at 30.0 — the negated id breaks them ASC, so
    // ids 103 then 104 survive and 10.0/20.0 are evicted by the heap
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(r => (r.getDouble(0), -r.getLong(1))) ===
      Seq((30.0, 103L), (30.0, 104L)))
    val g2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
    assert(g2.map(r => (r.getDouble(0), -r.getLong(1))) === Seq((5.0, 201L)))
  }

  test("mg_topfreq: Misra-Gries sketch aggregate callable from pure SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT mg_topfreq(item, 2) AS sk FROM VALUES
        |  ('a'), ('a'), ('a'), ('b'), ('b'), ('c'), ('a')
        |  AS t(item)""".stripMargin).collect()(0)
    val est = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // 'a' (4 of 7) is above n/(k+1) = 7/3 — guaranteed present with
    // undercount <= 2; only guarantees are asserted (the rest of the
    // summary is order-dependent by contract)
    assert(est.size <= 2)
    assert(est.contains("a"))
    assert(est("a") >= 4L - 7L / 3L && est("a") <= 4L)
  }

  test("GR record roundtrip: encode -> decode_gr_record in SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val payload = BinRecord.encode(42L, 3.5, "sensor-a")
    val df = Seq(payload).toDF("payload")
    df.createOrReplaceTempView("gr_raw")
    val r = spark.sql(
      "SELECT decode_gr_record(payload) AS rec FROM gr_raw").select("rec.*").collect()(0)
    assert(r.getLong(0) === 42L)
    assert(r.getDouble(1) === 3.5)
    assert(r.getString(2) === "sensor-a")
  }

  test("struct record mapper decodes message payloads (protobuf sample equiv)") {
    val broker = Files.createTempDirectory("graft-broker").toFile.getAbsolutePath
    GraftQueueBroker.publish(broker, "q1", (0 until 5).map { i =>
      GraftQueueBroker.Msg(i.toLong, 1700000000000000L + i, 1700000000001000L + i,
        4, "t/gr", "", 0L, BinRecord.encode(i.toLong * 10, i * 0.5, s"tag$i"))
    })
    val recs = Pipelines.mapToStructRecord(
      Pipelines.readQueuesBounded(spark, broker, Seq("q1"))).collect()
    assert(recs.length === 5)
    val r3 = recs.find(_.message_id == 3L).get
    assert(r3.id === 30L && r3.value === 1.5 && r3.tag === "tag3")
  }

  test("stateful dedup emits each redelivered message id exactly once") {
    val broker = Files.createTempDirectory("graft-broker").toFile.getAbsolutePath
    def batch(ids: Range): Seq[GraftQueueBroker.Msg] = ids.map { i =>
      GraftQueueBroker.textMsg(i.toLong, 1700000000000000L + i * 1000L, "t", s"payload $i")
    }
    // broker-level redelivery: ids 0..9 spooled twice, 10..14 once
    GraftQueueBroker.publish(broker, "q1", batch(0 until 10))
    GraftQueueBroker.publish(broker, "q1", batch(0 until 10) ++ batch(10 until 15))
    val q = Pipelines.statefulDedup(Pipelines.readQueues(spark, broker, Seq("q1")))
      .writeStream.format("memory").queryName("sdedup").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt").toFile.getAbsolutePath)
      .start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("sdedup").collect().map(_.getLong(1)).toSeq
    assert(ids.length === 15, s"expected 15 unique, got ${ids.length}")
    assert(ids.toSet === (0L until 15L).toSet)
  }
}
