package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // real container headers, built byte-for-byte from the published
  // layouts — what a file from an actual camera/encoder starts with
  private def bytes(is: Int*): Array[Byte] = is.map(_.toByte).toArray
  private val pngRgba640x480 = bytes(
    0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
    0, 0, 0, 13, 'I', 'H', 'D', 'R', // IHDR length + type
    0, 0, 2, 0x80, // width 640 BE
    0, 0, 1, 0xE0, // height 480 BE
    8, 6) // bit depth, color type 6 = RGBA
  private val gif320x200 = bytes(
    'G', 'I', 'F', '8', '9', 'a',
    0x40, 0x01, // width 320 LE
    0xC8, 0x00) // height 200 LE
  private val bmp800x600x24 = bytes(
    'B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // file header
    40, 0, 0, 0, // BITMAPINFOHEADER size
    0x20, 0x03, 0, 0, // width 800 LE
    0x58, 0x02, 0, 0, // height 600 LE
    1, 0, 24, 0) // planes, bpp 24
  private val wavStereo44k = bytes(
    'R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, // fmt chunk, PCM
    2, 0, // channels 2 LE
    0x44, 0xAC, 0, 0) // sample rate 44100 LE
  private val jpegFrame = bytes(0xFF, 0xD8, 0xFF, 0xE0)
  // a real JFIF file prefix: SOI, full APP0 segment, then a baseline
  // SOF0 frame header — dims live HERE, at a variable offset
  private val jpegJfif1024x768 = bytes(
    0xFF, 0xD8, // SOI
    0xFF, 0xE0, 0, 16, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0, // APP0
    0xFF, 0xC0, 0, 17, 8, // SOF0, len 17, precision 8
    0x03, 0x00, // height 768 BE
    0x04, 0x00, // width 1024 BE
    3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) // 3 components
  private val rawText = "just some text".getBytes("UTF-8")

  test("decodeMedia parses real container headers: dispatch + fields") {
    val png = MultimodalOps.decodeMedia(1L, pngRgba640x480)
    assert(png.format === "png" && png.width === Some(640L) &&
      png.height === Some(480L) && png.channels === Some(4L))
    val gif = MultimodalOps.decodeMedia(2L, gif320x200)
    assert(gif.format === "gif" && gif.width === Some(320L) && gif.height === Some(200L))
    val bmp = MultimodalOps.decodeMedia(3L, bmp800x600x24)
    assert(bmp.format === "bmp" && bmp.width === Some(800L) &&
      bmp.height === Some(600L) && bmp.channels === Some(3L))
    val wav = MultimodalOps.decodeMedia(4L, wavStereo44k)
    assert(wav.format === "wav" && wav.channels === Some(2L) &&
      wav.sample_rate === Some(44100L))
    val jpg = MultimodalOps.decodeMedia(5L, jpegFrame)
    assert(jpg.format === "jpeg" && jpg.width.isEmpty)
    // the SOF segment walk: dims found at their variable offset,
    // behind a skipped APP0 segment
    val jfif = MultimodalOps.decodeMedia(8L, jpegJfif1024x768)
    assert(jfif.format === "jpeg" && jfif.width === Some(1024L) &&
      jfif.height === Some(768L) && jfif.channels === Some(3L))
    // a truncated SOF (cut before the component count) degrades to
    // no-dims, never an out-of-bounds read
    assert(MultimodalOps.decodeMedia(9L, jpegJfif1024x768.take(29)).width.isEmpty)
    val raw = MultimodalOps.decodeMedia(6L, rawText)
    assert(raw.format === "raw" && raw.width.isEmpty && raw.channels.isEmpty)
    // a TRUNCATED header must not classify: 8 magic bytes alone are
    // not a decodable PNG
    assert(MultimodalOps.decodeMedia(7L, pngRgba640x480.take(20)).format === "raw")
    // histogram mass always equals byte length
    assert(png.hist.sum === png.byte_len)
  }

  test("expression path decodes the same real headers as the JVM path") {
    import spark.implicits._
    val payloads = Seq(
      (1L, pngRgba640x480), (2L, gif320x200), (3L, bmp800x600x24),
      (4L, wavStereo44k), (5L, jpegFrame), (6L, rawText))
    val viaExpr = payloads.toDF("doc_id", "payload")
      .select(col("doc_id") +: MultimodalOps.mediaFields(col("payload")): _*)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5)), r.getLong(6))).toMap
    payloads.foreach { case (id, p) =>
      val f = MultimodalOps.decodeMedia(id, p)
      val (fmt, w, h, ch, sr, n) = viaExpr(id)
      assert(fmt === f.format, s"doc $id format")
      assert(w === f.width && h === f.height, s"doc $id dims")
      assert(ch === f.channels && sr === f.sample_rate, s"doc $id ch/rate")
      assert(n === f.byte_len, s"doc $id len")
    }
  }

  test("gate payloads: mapPartitions path == expression path on every document") {
    val expr = MultimodalOps.mediaDecode(spark, SparkSpec.sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5)), r.getLong(6))).toMap
    val feats = MultimodalOps.featureExtract(spark, SparkSpec.sf).collect()
    assert(feats.length === expr.size)
    // every constructed container appears — all dispatch branches run
    assert(feats.map(_.format).distinct.sorted ===
      Seq("bmp", "gif", "jpeg", "png", "raw", "wav"))
    feats.foreach { f =>
      val (fmt, w, h, ch, sr, n) = expr(f.doc_id)
      assert(fmt === f.format && n === f.byte_len, s"doc ${f.doc_id}")
      if (f.format == "jpeg") {
        // the declared asymmetry: the expression path dispatches JPEG
        // by magic only (dims live in variable-offset SOF segments),
        // the JVM path walks them — SOF-bearing payloads (tag 5)
        // carry dims on the JVM side only
        assert(w.isEmpty && h.isEmpty && ch.isEmpty, s"doc ${f.doc_id} expr jpeg")
        if (f.doc_id % 7 == 5)
          assert(f.width.nonEmpty && f.height.nonEmpty && f.channels === Some(3L),
            s"doc ${f.doc_id} must carry SOF dims")
        else
          assert(f.width.isEmpty && f.height.isEmpty, s"doc ${f.doc_id} bare jpeg")
      } else {
        assert(w === f.width && h === f.height, s"doc ${f.doc_id} dims")
        assert(ch === f.channels, s"doc ${f.doc_id} ch")
      }
      assert(sr === f.sample_rate, s"doc ${f.doc_id} rate")
      assert(f.hist.sum === f.byte_len, s"doc ${f.doc_id} hist mass")
    }
    // the SOF dims themselves are exact: width/height derive from
    // doc_id the same way the payload constructor derives them
    feats.filter(f => f.doc_id % 7 == 5).take(50).foreach { f =>
      assert(f.width === Some(16L + f.doc_id % 1000) &&
        f.height === Some(16L + (f.doc_id * 7) % 1000), s"doc ${f.doc_id} SOF dims")
    }
  }

  test("binaryMeta checksum equals sum of payload bytes") {
    val row = MultimodalOps.binaryMeta(spark, SparkSpec.sf)
      .filter(col("doc_id") === 0).collect()(0)
    val text = Tables(spark, SparkSpec.sf, "documents")
      .filter(col("doc_id") === 0)
      .collect()(0).getAs[String]("text")
    assert(row.getAs[Long]("checksum") === text.getBytes("UTF-8").map(_.toLong & 0xFF).sum)
    assert(row.getAs[Long]("byte_len") === text.getBytes("UTF-8").length.toLong)
  }
}
