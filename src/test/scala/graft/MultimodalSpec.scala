package graft

import graft.operators.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("stubDecode is deterministic and histogram counts all bytes") {
    val payload = "abcXYZ 0189".getBytes("UTF-8")
    val f = MultimodalOps.stubDecode(7L, payload)
    assert(f.doc_id === 7L)
    assert(f.byte_len === payload.length)
    assert(f.hist.sum === payload.length)
    assert(f.width === 64 + (payload(0) & 0x3F))
    assert(f.channels === 3)
    // bin of 'a'(0x61) is 6
    assert(f.hist(6) >= 3)
  }

  test("featureExtract runs distributed and covers every document") {
    val nDocs = Tables(spark, SparkSpec.sf, "documents").count()
    val feats = MultimodalOps.featureExtract(spark, SparkSpec.sf).collect()
    assert(feats.length === nDocs)
    // histogram mass equals byte length for every row
    feats.foreach(f => assert(f.hist.sum === f.byte_len))
  }

  test("binaryMeta checksum equals sum of payload bytes") {
    val row = MultimodalOps.binaryMeta(spark, SparkSpec.sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0).collect()(0)
    val text = Tables(spark, SparkSpec.sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0)
      .collect()(0).getAs[String]("text")
    assert(row.getAs[Long]("checksum") === text.getBytes("UTF-8").map(_.toLong & 0xFF).sum)
    assert(row.getAs[Long]("byte_len") === text.getBytes("UTF-8").length.toLong)
  }
}
