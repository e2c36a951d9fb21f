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
  // a minimal spec-shaped MP4: ftyp(isom) + moov[mvhd(ts=600,dur=1500)
  // + trak[tkhd(320x240 as 16.16 fixed)]] — all sizes/versions real
  private def be32(v: Long): Seq[Int] =
    Seq((v >> 24).toInt & 0xFF, (v >> 16).toInt & 0xFF, (v >> 8).toInt & 0xFF, v.toInt & 0xFF)
  private val unityMatrix: Seq[Int] =
    be32(0x10000L) ++ be32(0) ++ be32(0) ++
    be32(0) ++ be32(0x10000L) ++ be32(0) ++
    be32(0) ++ be32(0) ++ be32(0x40000000L)
  private def mvhdV0(ts: Long, dur: Long): Seq[Int] =
    be32(108) ++ "mvhd".map(_.toInt) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(ts) ++ be32(dur) ++ be32(0x10000L) ++ Seq(1, 0, 0, 0) ++
      be32(0) ++ be32(0) ++ unityMatrix ++ Seq.fill(24)(0) ++ be32(2)
  private def tkhdV0(w: Long, h: Long, dur: Long): Seq[Int] =
    be32(92) ++ "tkhd".map(_.toInt) ++ be32(7) ++ be32(0) ++ be32(0) ++
      be32(1) ++ be32(0) ++ be32(dur) ++ be32(0) ++ be32(0) ++
      Seq(0, 0, 0, 0, 0, 0, 0, 0) ++ unityMatrix ++ be32(w << 16) ++ be32(h << 16)
  private val mp4Tree: Array[Byte] = bytes(
    (be32(16) ++ "ftyp".map(_.toInt) ++ "isom".map(_.toInt) ++ be32(0x200) ++
      be32(216) ++ "moov".map(_.toInt) ++ mvhdV0(600, 1500) ++
      be32(100) ++ "trak".map(_.toInt) ++ tkhdV0(320, 240, 1500)): _*)
  private val mp4FtypOnly: Array[Byte] = bytes(
    (be32(16) ++ "ftyp".map(_.toInt) ++ "mp42".map(_.toInt) ++ be32(0x200)): _*)

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

  test("mp4Meta walks the ISO-BMFF box tree: brand, tkhd dims, mvhd duration") {
    val full = MultimodalOps.decodeMedia(10L, mp4Tree)
    assert(full.format === "mp4" && full.brand === Some("isom"))
    assert(full.width === Some(320L) && full.height === Some(240L))
    // 1500 units at timescale 600 = 2500 ms
    assert(full.duration_ms === Some(2500L))
    assert(full.channels.isEmpty && full.sample_rate.isEmpty)
    // bare ftyp: dispatch + brand only, the nested walk finds no moov
    val bare = MultimodalOps.decodeMedia(11L, mp4FtypOnly)
    assert(bare.format === "mp4" && bare.brand === Some("mp42"))
    assert(bare.width.isEmpty && bare.duration_ms.isEmpty)
    // garbage after a valid ftyp degrades (text bytes are not a valid
    // box): brand survives, nothing else
    val trailing = MultimodalOps.decodeMedia(12L, mp4FtypOnly ++ rawText)
    assert(trailing.brand === Some("mp42") && trailing.width.isEmpty)
    // truncated mid-moov: every read is bounds-checked, no fields leak
    val cut = MultimodalOps.decodeMedia(13L, mp4Tree.take(40))
    assert(cut.format === "mp4" && cut.brand === Some("isom") && cut.width.isEmpty)
    // below the 16-byte dispatch minimum: raw
    assert(MultimodalOps.decodeMedia(14L, mp4Tree.take(12)).format === "raw")
  }

  test("mp4Meta handles the spec escapes: 64-bit largesize and v1 boxes") {
    // moov with size=1 + largesize, containing a version-1 mvhd
    // (64-bit creation/modification/duration) and a version-1 tkhd
    def be64(v: Long): Seq[Int] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
    val mvhdV1: Seq[Int] =
      be32(120) ++ "mvhd".map(_.toInt) ++ Seq(1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(90000) ++ be64(450000) ++ be32(0x10000L) ++ Seq(1, 0, 0, 0) ++
        be32(0) ++ be32(0) ++ unityMatrix ++ Seq.fill(24)(0) ++ be32(2)
    val tkhdV1: Seq[Int] =
      be32(104) ++ "tkhd".map(_.toInt) ++ Seq(1, 0, 0, 7) ++ be64(0) ++ be64(0) ++
        be32(1) ++ be32(0) ++ be64(450000) ++ be32(0) ++ be32(0) ++
        Seq(0, 0, 0, 0, 0, 0, 0, 0) ++ unityMatrix ++ be32(1920L << 16) ++ be32(1080L << 16)
    val trakV1 = be32(8 + tkhdV1.size) ++ "trak".map(_.toInt) ++ tkhdV1
    val moovPayload = mvhdV1 ++ trakV1
    val moovLarge = be32(1) ++ "moov".map(_.toInt) ++ be64(16L + moovPayload.size) ++ moovPayload
    val p = bytes((be32(16) ++ "ftyp".map(_.toInt) ++ "iso6".map(_.toInt) ++ be32(0) ++
      moovLarge): _*)
    val f = MultimodalOps.decodeMedia(15L, p)
    assert(f.brand === Some("iso6"))
    assert(f.width === Some(1920L) && f.height === Some(1080L))
    // 450000 units at timescale 90000 = 5000 ms
    assert(f.duration_ms === Some(5000L))
    // a lying largesize (bigger than the buffer) stops the level cold
    val lying = bytes((be32(16) ++ "ftyp".map(_.toInt) ++ "iso6".map(_.toInt) ++ be32(0) ++
      be32(1) ++ "moov".map(_.toInt) ++ be64(1L << 40)): _*)
    val g = MultimodalOps.decodeMedia(16L, lying)
    assert(g.brand === Some("iso6") && g.width.isEmpty && g.duration_ms.isEmpty)
  }

  test("expression path decodes the same real headers as the JVM path") {
    import spark.implicits._
    val payloads = Seq(
      (1L, pngRgba640x480), (2L, gif320x200), (3L, bmp800x600x24),
      (4L, wavStereo44k), (5L, jpegFrame), (6L, rawText), (7L, mp4FtypOnly))
    val viaExpr = payloads.toDF("doc_id", "payload")
      .select(col("doc_id") +: MultimodalOps.mediaFields(col("payload")): _*)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), r.getLong(8))).toMap
    payloads.foreach { case (id, p) =>
      val f = MultimodalOps.decodeMedia(id, p)
      val (fmt, br, w, h, ch, sr, n) = viaExpr(id)
      assert(fmt === f.format, s"doc $id format")
      assert(br === f.brand, s"doc $id brand")
      assert(w === f.width && h === f.height, s"doc $id dims")
      assert(ch === f.channels && sr === f.sample_rate, s"doc $id ch/rate")
      assert(n === f.byte_len, s"doc $id len")
    }
    // the declared asymmetry: on a FULL box tree the walk carries
    // dims/duration the fixed-offset path cannot reach (brand it can)
    val full = Seq((8L, mp4Tree)).toDF("doc_id", "payload")
      .select(col("doc_id") +: MultimodalOps.mediaFields(col("payload")): _*)
      .collect()(0)
    assert(full.getString(1) === "mp4" && full.getString(2) === "isom")
    assert(full.isNullAt(3) && full.isNullAt(4) && full.isNullAt(7))
  }

  test("gate payloads: mapPartitions path == expression path on every document") {
    val expr = MultimodalOps.mediaDecode(spark, SparkSpec.sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)), r.getLong(8))).toMap
    val feats = MultimodalOps.featureExtract(spark, SparkSpec.sf).collect()
    assert(feats.length === expr.size)
    // every constructed container appears — all dispatch branches run
    assert(feats.map(_.format).distinct.sorted ===
      Seq("bmp", "gif", "jpeg", "mp4", "png", "raw", "wav"))
    feats.foreach { f =>
      val (fmt, br, w, h, ch, sr, n) = expr(f.doc_id)
      assert(fmt === f.format && n === f.byte_len, s"doc ${f.doc_id}")
      assert(br === f.brand, s"doc ${f.doc_id} brand") // fixed-offset: both paths
      if (f.format == "jpeg") {
        // the declared asymmetry: the expression path dispatches JPEG
        // by magic only (dims live in variable-offset SOF segments),
        // the JVM path walks them — SOF-bearing payloads (tag 5)
        // carry dims on the JVM side only
        assert(w.isEmpty && h.isEmpty && ch.isEmpty, s"doc ${f.doc_id} expr jpeg")
        if (f.doc_id % 8 == 5)
          assert(f.width.nonEmpty && f.height.nonEmpty && f.channels === Some(3L),
            s"doc ${f.doc_id} must carry SOF dims")
        else
          assert(f.width.isEmpty && f.height.isEmpty, s"doc ${f.doc_id} bare jpeg")
      } else if (f.format == "mp4") {
        // same asymmetry for the nested-box walk: full trees (id/8
        // even) carry dims + duration on the JVM side only
        assert(w.isEmpty && h.isEmpty, s"doc ${f.doc_id} expr mp4")
        if ((f.doc_id / 8) % 2 == 0) {
          assert(f.brand === Some("isom") && f.width.nonEmpty &&
            f.height.nonEmpty && f.duration_ms.nonEmpty,
            s"doc ${f.doc_id} must carry box-tree fields")
        } else
          assert(f.brand === Some("mp42") && f.width.isEmpty &&
            f.duration_ms.isEmpty, s"doc ${f.doc_id} bare ftyp")
      } else {
        assert(w === f.width && h === f.height, s"doc ${f.doc_id} dims")
        assert(ch === f.channels, s"doc ${f.doc_id} ch")
      }
      assert(sr === f.sample_rate, s"doc ${f.doc_id} rate")
      assert(f.hist.sum === f.byte_len, s"doc ${f.doc_id} hist mass")
    }
    // the SOF dims themselves are exact: width/height derive from
    // doc_id the same way the payload constructor derives them
    feats.filter(f => f.doc_id % 8 == 5).take(50).foreach { f =>
      assert(f.width === Some(16L + f.doc_id % 1000) &&
        f.height === Some(16L + (f.doc_id * 7) % 1000), s"doc ${f.doc_id} SOF dims")
    }
    // ...and so do the MP4 box-tree fields: tkhd 16.16 dims and the
    // mvhd duration rescale reproduce the constructor's arithmetic
    feats.filter(f => f.doc_id % 8 == 6 && (f.doc_id / 8) % 2 == 0).take(50).foreach { f =>
      val ts = 600L * (1 + f.doc_id % 3)
      val dur = ts * (1 + f.doc_id % 300) + f.doc_id % 97
      assert(f.width === Some(16L + f.doc_id % 1000) &&
        f.height === Some(16L + (f.doc_id * 7) % 1000), s"doc ${f.doc_id} tkhd dims")
      assert(f.duration_ms === Some(dur * 1000L / ts), s"doc ${f.doc_id} mvhd duration")
    }
  }

  test("mp4TimeSample: one row per media-time instant, frame mapping exact, " +
    "non-video payloads contribute nothing") {
    import org.apache.spark.sql.functions.col
    val rows = MultimodalOps.mp4TimeSample(spark, SparkSpec.sf).collect()
    assert(rows.nonEmpty, "tag-6 full trees must yield samples")
    val feats = MultimodalOps.featureExtract(spark, SparkSpec.sf).collect()
      .map(f => f.doc_id -> f).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    // only full-tree MP4s (walked duration) appear
    byDoc.keys.foreach { id =>
      assert(feats(id).format == "mp4" && feats(id).duration_ms.exists(_ > 0),
        s"doc $id sampled without a walked duration") }
    val expectedDocs = feats.values
      .filter(f => f.format == "mp4" && f.duration_ms.exists(_ > 0)).map(_.doc_id).toSet
    assert(byDoc.keySet === expectedDocs, "every walked video must be sampled")
    val payloads = Tables(spark, SparkSpec.sf, "documents")
      .select(col("doc_id"), MultimodalOps.taggedPayload.as("p"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    var vfrDocs = 0
    var cfrDocs = 0
    byDoc.foreach { case (id, rs) =>
      val f = feats(id); val dur = f.duration_ms.get
      val nf = math.max(1L, (f.byte_len + MultimodalOps.frameBytes - 1) /
        MultimodalOps.frameBytes)
      // sample count = one per interval instant, t=0 included
      assert(rs.length === (dur / MultimodalOps.timeSampleIntervalMs + 1).toInt,
        s"doc $id sample count")
      // the frame mapping is the stts run-length walk when the payload
      // carries a sample table, the CFR model otherwise
      val wk = MultimodalOps.mp4WalkAll(payloads(id))
      val vfr = wk.stts.filter(_ => wk.mdhdTs > 0)
      if (vfr.isDefined) vfrDocs += 1 else cfrDocs += 1
      rs.foreach { r =>
        val (i, t, fi, off) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(t === i * MultimodalOps.timeSampleIntervalMs)
        val expected = vfr match {
          case Some(es) => MultimodalOps.sttsFrameAt(t * wk.mdhdTs / 1000L, es)
          case None => math.min(nf - 1, t * nf / dur)
        }
        assert(fi === expected, s"doc $id frame mapping at $t")
        // byte offset: the chunk layout's real file offset when the
        // payload carries one, the stride model otherwise
        val expectedOff = wk.layout.flatMap(_.offsetOf(fi))
          .getOrElse(fi * MultimodalOps.frameBytes)
        assert(off === expectedOff, s"doc $id byte mapping at frame $fi")
        assert(t <= dur)
      }
      // frame ordinals are monotone in time
      val fis = rs.sortBy(_.getLong(2)).map(_.getLong(3))
      assert(fis.zip(fis.tail).forall { case (a, b) => a <= b })
      if (vfr.isEmpty) assert(fis.last <= nf - 1)
    }
    // BOTH mapping paths must stay gate-covered — a payload change
    // that silently drops one population would make its hash vacuous
    assert(vfrDocs > 0, "no VFR (stts-carrying) payloads sampled")
    assert(cfrDocs > 0, "no CFR (sample-table-less) payloads sampled")
    // and BOTH stsz forms (fixed-size and the r13-promoted per-sample
    // table) must be present among the walked layouts, each actually
    // driving the FRAME→BYTE mapping
    val layouts = byDoc.keys.map(id => MultimodalOps.mp4WalkAll(payloads(id)))
      .flatMap(_.layout)
    assert(layouts.exists(_.sizeFixed > 0), "no fixed-size stsz payloads")
    assert(layouts.exists(_.sizes.isDefined), "no per-sample stsz payloads")
  }

  test("ChunkLayout.offsetOf: chunk-run walk exact for fixed and variable " +
    "sizes; beyond-capacity and malformed tables degrade") {
    import graft.operators.MultimodalOps.ChunkLayout
    // 2 runs (chunks 1-2 at 3/chunk, chunk 3+ at 4/chunk), 3 chunks,
    // fixed size 10: samples 0-2 in chunk 1, 3-5 in chunk 2, 6-9 in 3
    val fixed = ChunkLayout(10L, None,
      Array((1L, 3L), (3L, 4L)), Array(1000L, 2000L, 3000L))
    assert(fixed.offsetOf(0) === Some(1000L))
    assert(fixed.offsetOf(2) === Some(1020L))
    assert(fixed.offsetOf(3) === Some(2000L))
    assert(fixed.offsetOf(5) === Some(2020L))
    assert(fixed.offsetOf(6) === Some(3000L))
    assert(fixed.offsetOf(9) === Some(3030L))
    assert(fixed.offsetOf(10) === None, "past the chunks' capacity")
    // variable per-sample sizes: offsets accumulate within the chunk
    val varSz = ChunkLayout(0L, Some(Array(5L, 7L, 11L, 13L, 17L)),
      Array((1L, 3L)), Array(500L, 900L))
    assert(varSz.offsetOf(0) === Some(500L))
    assert(varSz.offsetOf(1) === Some(505L))
    assert(varSz.offsetOf(2) === Some(512L))
    assert(varSz.offsetOf(3) === Some(900L)) // chunk 2 restarts at its stco base
    assert(varSz.offsetOf(4) === Some(913L))
    assert(varSz.offsetOf(6) === None, "beyond the size table")
    // stsz SHORTER than the declared chunks' capacity: a sample whose
    // chunk exists but whose index exceeds the size table degrades
    // per-sample (i > sz.length → None → fixed-stride fallback); the
    // DuckDB twin mirrors this with its `fidx <= mvar.cnt` arm guard,
    // so both engines fall back on the SAME samples of a malformed
    // payload instead of the twin summing a truncated size table
    val shortSz = ChunkLayout(0L, Some(Array(5L, 7L, 11L, 13L)),
      Array((1L, 3L)), Array(500L, 900L))
    assert(shortSz.offsetOf(4) === Some(913L), "covered by the table")
    assert(shortSz.offsetOf(5) === None,
      "inside chunk 2's span but past the 4-entry stsz table")
    // malformed stsc (first run not at chunk 1 / non-ascending /
    // zero rate) must never produce a layout at parse time
    def tree2(stbl: Seq[Int]): Array[Byte] = {
      val minf = be32(8 + stbl.size) ++ "minf".map(_.toInt) ++ stbl
      val mdia = be32(8 + minf.size) ++ "mdia".map(_.toInt) ++ minf
      val trak = be32(8 + mdia.size) ++ "trak".map(_.toInt) ++ mdia
      val moov = be32(8 + trak.size) ++ "moov".map(_.toInt) ++ trak
      bytes((be32(16) ++ "ftyp".map(_.toInt) ++ "isom".map(_.toInt) ++ be32(0x200) ++
        moov): _*)
    }
    def stscBox(runs: Seq[(Long, Long)]): Seq[Int] =
      be32(16 + 12 * runs.size) ++ "stsc".map(_.toInt) ++ be32(0) ++
        be32(runs.size.toLong) ++
        runs.flatMap { case (fc, spc) => be32(fc) ++ be32(spc) ++ be32(1) }
    val stszF = be32(20) ++ "stsz".map(_.toInt) ++ be32(0) ++ be32(10) ++ be32(5)
    val stco2 = be32(16 + 8) ++ "stco".map(_.toInt) ++ be32(0) ++ be32(2) ++
      be32(100) ++ be32(200)
    def stblOf(stsc: Seq[Int]): Seq[Int] =
      be32(8 + stszF.size + stsc.size + stco2.size) ++ "stbl".map(_.toInt) ++
        stszF ++ stsc ++ stco2
    val good = MultimodalOps.mp4WalkAll(tree2(stblOf(stscBox(Seq((1L, 2L))))))
    assert(good.layout.isDefined)
    assert(good.layout.get.offsetOf(3) === Some(210L))
    for (bad <- Seq(Seq((2L, 2L)), Seq((1L, 2L), (1L, 3L)), Seq((1L, 0L))))
      assert(MultimodalOps.mp4WalkAll(tree2(stblOf(stscBox(bad)))).layout.isEmpty,
        s"malformed stsc $bad must degrade")
  }

  test("mp4 sample-table walk: stts honored exactly, v1 mdhd, malformed degrades") {
    def mdhdV0(mts: Long, mdur: Long): Seq[Int] =
      be32(32) ++ "mdhd".map(_.toInt) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(mts) ++ be32(mdur) ++ be32(0)
    def mdhdV1(mts: Long, mdur: Long): Seq[Int] =
      be32(44) ++ "mdhd".map(_.toInt) ++ Seq(1, 0, 0, 0) ++
        Seq.fill(16)(0) ++ be32(mts) ++
        be32(0) ++ be32(mdur) ++ be32(0) // 64-bit duration + lang/pre
    def sttsBox(entries: Seq[(Long, Long)]): Seq[Int] =
      be32(16 + 8 * entries.size) ++ "stts".map(_.toInt) ++ be32(0) ++
        be32(entries.size.toLong) ++
        entries.flatMap { case (c, d) => be32(c) ++ be32(d) }
    def tree(mdhd: Seq[Int], stts: Seq[Int]): Array[Byte] = {
      val stbl = be32(8 + stts.size) ++ "stbl".map(_.toInt) ++ stts
      val minf = be32(8 + stbl.size) ++ "minf".map(_.toInt) ++ stbl
      val mdia = be32(8 + mdhd.size + minf.size) ++ "mdia".map(_.toInt) ++ mdhd ++ minf
      val tkhd = tkhdV0(320, 240, 1500)
      val trak = be32(8 + tkhd.size + mdia.size) ++ "trak".map(_.toInt) ++ tkhd ++ mdia
      val moov = be32(8 + 108 + trak.size) ++ "moov".map(_.toInt) ++
        mvhdV0(600, 1500) ++ trak
      bytes((be32(16) ++ "ftyp".map(_.toInt) ++ "isom".map(_.toInt) ++ be32(0x200) ++
        moov): _*)
    }
    val entries = Seq((2L, 1000L), (3L, 500L))
    val wk = MultimodalOps.mp4WalkAll(tree(mdhdV0(1000, 3500), sttsBox(entries)))
    assert(wk.mdhdTs === 1000L)
    assert(wk.stts.map(_.toSeq) === Some(entries))
    // run-length mapping: entry 1 covers media [0,2000) at 1000/frame,
    // entry 2 covers [2000,3500) at 500/frame, past-table clamps
    val es = wk.stts.get
    val expect = Seq(0L -> 0L, 999L -> 0L, 1000L -> 1L, 1999L -> 1L,
      2000L -> 2L, 2499L -> 2L, 2500L -> 3L, 3499L -> 4L,
      3500L -> 4L, 999999L -> 4L)
    expect.foreach { case (t, f) =>
      assert(MultimodalOps.sttsFrameAt(t, es) === f, s"tMedia=$t") }
    // v1 mdhd: 64-bit creation/modification push the timescale out
    val wk1 = MultimodalOps.mp4WalkAll(tree(mdhdV1(90000, 450000), sttsBox(entries)))
    assert(wk1.mdhdTs === 90000L)
    // malformed tables degrade to None (the CFR path), never throw:
    // a zero delta, an oversized entry count, a size too small for
    // its declared entries
    assert(MultimodalOps.mp4WalkAll(
      tree(mdhdV0(1000, 0), sttsBox(Seq((2L, 0L))))).stts.isEmpty)
    assert(MultimodalOps.mp4WalkAll(
      tree(mdhdV0(1000, 0), sttsBox(Seq.fill(65)((1L, 1L))))).stts.isEmpty)
    val lying = sttsBox(entries).toArray
    // claim 3 entries but carry 2 (size says 32, count says 3)
    val lied = lying.updated(15, 3)
    assert(MultimodalOps.mp4WalkAll(
      tree(mdhdV0(1000, 0), lied.toSeq)).stts.isEmpty)
    // oversized raw-u32 values (≥ 2^31) degrade too: sttsFrameAt's
    // c*d products / cumulative sums would silently wrap Long
    assert(MultimodalOps.mp4WalkAll(
      tree(mdhdV0(1000, 0), sttsBox(Seq((0x80000000L, 1000L))))).stts.isEmpty)
    assert(MultimodalOps.mp4WalkAll(
      tree(mdhdV0(1000, 0), sttsBox(Seq((2L, 0xFFFFFFFFL))))).stts.isEmpty)
    // per-entry products in range but the cumulative sum wraps
    assert(MultimodalOps.mp4WalkAll(
      tree(mdhdV0(1000, 0),
        sttsBox(Seq.fill(4)((0x7FFFFFFEL, 0x7FFFFFFEL))))).stts.isEmpty)
    // nested mvhd beyond depth 2 is invisible (the twin's moov-level
    // extractor is the contract): one smuggled into stbl must not
    // set the movie timescale now that the walk descends that deep
    val smuggledMvhd = {
      val mv = mvhdV0(600, 1500)
      val stbl = be32(8 + mv.size) ++ "stbl".map(_.toInt) ++ mv
      val minf = be32(8 + stbl.size) ++ "minf".map(_.toInt) ++ stbl
      val mdia = be32(8 + minf.size) ++ "mdia".map(_.toInt) ++ minf
      val trak = be32(8 + mdia.size) ++ "trak".map(_.toInt) ++ mdia
      val moov = be32(8 + trak.size) ++ "moov".map(_.toInt) ++ trak
      bytes((be32(16) ++ "ftyp".map(_.toInt) ++ "isom".map(_.toInt) ++ be32(0x200) ++
        moov): _*)
    }
    assert(MultimodalOps.mp4WalkAll(smuggledMvhd).durMs.isEmpty)
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

  test("dHash kernel: brightness-shift invariant, local-edit robust, " +
    "content-sensitive") {
    import graft.functions.DHashKernel
    val base = Array.tabulate(256)(j => ((j * 7 + 13) % 251).toByte)
    val h0 = DHashKernel.hash(base, 0)
    // uniform brightness shift preserves every comparison (pattern
    // values ≤ 250, so +4 never wraps the unsigned byte range)
    assert(DHashKernel.hash(base.map(b => ((b & 0xFF) + 4).toByte), 0) === h0,
      "brightness shift must not move the hash")
    // one-byte local edit flips at most 2 bits (its two comparisons)
    val edited = base.clone(); edited(128) = ((base(128) & 0xFF) ^ 0x7F).toByte
    assert(java.lang.Long.bitCount(DHashKernel.hash(edited, 0) ^ h0) <= 2)
    // different content diverges far past the near-dup threshold
    val other = Array.tabulate(256)(j => ((j * 31 + 101) % 249).toByte)
    assert(java.lang.Long.bitCount(DHashKernel.hash(other, 0) ^ h0) >
      operators.MultimodalOps.phashMaxHamming)
    // offset honored: hash over a shifted copy with matching offset
    val padded = Array.fill[Byte](30)(0) ++ base
    assert(DHashKernel.hash(padded, 30) === h0)
  }

  test("dedup_image_phash: every planted gradient pair surfaces at " +
    "Hamming <= 1 in BOTH signed formats; population is the raster " +
    "tags; threshold honored; the format salt keeps plants apart") {
    val rows = operators.MultimodalOps.imagePhash(spark, SparkSpec.sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), ham) =>
      assert(a < b)
      assert(Set(1L, 2L)(a % 8) && Set(1L, 2L)(b % 8),
        "population must be the raster tags (BMP tag 2 + GIF tag 1)")
      assert(ham <= operators.MultimodalOps.phashMaxHamming)
    }
    // planted pairs: BMP (18+80m, 58+80m) and GIF (17+80m, 57+80m)
    // for every group inside the corpus
    val nDocs = Tables(spark, SparkSpec.sf, "documents").count()
    def planted(lo: Long, hi: Long) =
      (0L until nDocs by 80L).map(m => (m + lo, m + hi)).filter(_._2 < nDocs)
    val bmp = planted(18, 58)
    val gif = planted(17, 57)
    assert(bmp.nonEmpty && gif.nonEmpty)
    (bmp ++ gif).foreach { p =>
      assert(rows.contains(p), s"planted pair $p missing")
      assert(rows(p) <= 1, s"planted pair $p drifted past the one perturbed bit")
    }
    // the GIF pattern salt keeps a group's two plants pixel-disjoint:
    // the cross-format (17+80m, 18+80m) pair must never surface
    (0L until nDocs by 80L).filter(_ + 18 < nDocs).foreach { m =>
      assert(!rows.contains((m + 17, m + 18)),
        s"unsalted cross-format planted pair at group ${m / 80}")
    }
  }

  test("signature populations partition by container tag: no doc signs " +
    "in two families, and each family stays inside its declared residues") {
    // the dispatch-table invariant (r17): with four signature families
    // gated on disjoint doc_id residues — image 1-2, audio 3, video 6
    // (mod 8), text = shingle-bearing docs of any tag — a gate edit
    // that lets one family's signer see another's payload class would
    // silently corrupt both gates. Pin the partition over the corpus.
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val img = ids(operators.MultimodalOps.imagePhashSigs(spark, SparkSpec.sf))
    val aud = ids(operators.MultimodalOps.audioPhashSigs(spark, SparkSpec.sf))
    val vid = ids(operators.MultimodalOps.videoPhashSigs(spark, SparkSpec.sf))
    assert(img.nonEmpty && aud.nonEmpty && vid.nonEmpty)
    assert(img.forall(id => id % 8 == 1 || id % 8 == 2),
      s"image signer outside the raster tags: ${img.filterNot(id => id % 8 == 1 || id % 8 == 2)}")
    assert(aud.forall(_ % 8 == 3),
      s"audio signer outside the WAV tag: ${aud.filterNot(_ % 8 == 3)}")
    assert(vid.forall(_ % 8 == 6),
      s"video signer outside the MP4 tag: ${vid.filterNot(_ % 8 == 6)}")
    assert((img & aud).isEmpty && (img & vid).isEmpty && (aud & vid).isEmpty,
      "signature families must never share a doc")
  }

  test("audio kernel: resample-invariant (2x upsample), local-edit " +
    "bound, content-sensitive, offset honored") {
    import graft.functions.AudioPhashKernel
    // 650 bytes = 10 per window: duplicating every byte (a uniform 2x
    // resample of the same media) keeps window boundaries aligned and
    // doubles every window energy — comparisons, and therefore the
    // signature, are unchanged (the kernel's rate-invariance claim)
    val base = Array.tabulate(650)(j => ((j * 7 + 13) % 251).toByte)
    val h0 = AudioPhashKernel.hash(base, 0)
    assert(AudioPhashKernel.hash(base.flatMap(b => Array(b, b)), 0) === h0,
      "uniform 2x resample must not move the hash")
    // one-byte local edit perturbs one window: flips at most the two
    // bits that compare it
    val edited = base.clone()
    edited(300) = ((base(300) & 0xFF) ^ 0x7F).toByte
    assert(java.lang.Long.bitCount(AudioPhashKernel.hash(edited, 0) ^ h0) <= 2)
    // different content diverges far past the near-dup threshold
    val other = Array.tabulate(650)(j => ((j * 31 + 101) % 249).toByte)
    assert(java.lang.Long.bitCount(AudioPhashKernel.hash(other, 0) ^ h0) >
      operators.MultimodalOps.phashMaxHamming)
    // offset honored: hash over a header-padded copy at the offset
    val padded = Array.fill[Byte](28)(0) ++ base
    assert(AudioPhashKernel.hash(padded, 28) === h0)
  }

  test("dedup_audio_phash: every planted perturbed-copy pair surfaces " +
    "at hamming <= 2; population is the WAV tag; threshold honored") {
    val rows = operators.MultimodalOps.audioPhash(spark, SparkSpec.sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), ham) =>
      assert(a < b)
      assert(a % 8 === 3 && b % 8 === 3, "population must be the WAV tag")
      assert(ham <= operators.MultimodalOps.phashMaxHamming)
    }
    // planted pairs: (19+80m, 59+80m) for every group inside the corpus
    val nDocs = Tables(spark, SparkSpec.sf, "documents").count()
    val planted = (0L until nDocs by 80L).map(m => (m + 19, m + 59))
      .filter(_._2 < nDocs)
    assert(planted.nonEmpty)
    planted.foreach { p =>
      assert(rows.contains(p), s"planted pair $p missing")
      assert(rows(p) <= 2,
        s"planted pair $p past the one-window local-edit bound")
    }
  }

  test("gate slice: every decode branch keeps population at the sf1/sf10 " +
    "id ranges, and the slice entries equal the filtered full operators") {
    val m = MultimodalOps.gateSliceModulus
    val r = MultimodalOps.gateSliceResidue
    // pure arithmetic over the contiguous 0..N-1 id ranges the corpora
    // carry at every SF (sf1 = 50k docs, sf10 = 500k): the CRT claim
    // in gateSlice's scaladoc, checked branch by branch
    for (n <- Seq(50000L, 500000L)) {
      val inSlice = (0L until n).filter(_ % m == r)
      for (t <- 0L until 8L)
        assert(inSlice.exists(_ % 8 == t), s"format tag $t empty at n=$n")
      // the four tag-6 sub-branches (mod-64 classes): VFR 6, VFR+
      // per-sample-stsz 38, CFR 22, bare-ftyp 14 — plus the JPEG SOF
      // walk's tag-5 class and the phash plants mod 80
      for (c <- Seq(6L, 38L, 22L, 14L))
        assert(inSlice.exists(_ % 64 == c), s"mp4 sub-branch mod-64=$c empty at n=$n")
      for (c <- Seq(18L, 58L, 17L, 57L, 19L, 59L))
        assert(inSlice.exists(_ % 80 == c), s"planted class mod-80=$c empty at n=$n")
    }
    // wrappers wired to the same code path: slice == full ∩ filter
    val sf = SparkSpec.sf
    val full = MultimodalOps.mediaDecode(spark, sf)
      .filter(col("doc_id") % m === r).collect().map(_.toString).sorted
    val slice = MultimodalOps.mediaDecodeSlice(spark, sf)
      .collect().map(_.toString).sorted
    assert(slice.nonEmpty && slice.sameElements(full))
  }

  test("videoPhashFromSigs geometry: slot keying separates instants, " +
    "and a single shared frame never pairs (k = 2)") {
    import spark.implicits._
    // docs 1/2: identical sigs at slots 0 and 1 → the one surviving
    // pair. doc 3: matches them at slot 0 only (its slot-1 sig is far
    // past hamming 6) → k = 2 drops it. doc 4: carries doc 1's slot-0
    // signature at slot 5 — an identical FRAME at a different instant
    // must never become a candidate (the slot join key).
    val far = 0x7777777777L // hamming(0x1234, far) = 20 > 6
    val sigs = Seq(
      (1L, 0L, 0x0F0FL), (1L, 1L, 0x1234L),
      (2L, 0L, 0x0F0FL), (2L, 1L, 0x1234L),
      (3L, 0L, 0x0F0FL), (3L, 1L, far),
      (4L, 5L, 0x0F0FL)
    ).toDF("doc_id", "slot", "sig")
    val got = MultimodalOps.videoPhashFromSigs(sigs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map((1L, 2L) -> ((2L, 0L))))
  }

  test("dedup_video_phash: every planted perturbed-copy video pairs on " +
    "ALL of its >= 2 shared instants at hamming <= 2; population is " +
    "the video tag; slice == filtered full") {
    // sf0.01: the planted classes (ids ≡ 70/198 mod 320) need ≥ 199
    // docs — absent from the sf0.001 spec corpus
    assume(SparkSpec.sf01Available, s"${SparkSpec.sf01} absent — skipping")
    val sf01 = SparkSpec.sf01
    val slots = MultimodalOps.videoPhashSigs(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nDocs = Tables(spark, sf01, "documents").count()
    val planted = (0L until nDocs by 320L).map(g => (g + 70, g + 198))
      .filter(_._2 < nDocs)
    assert(planted.nonEmpty)
    val pairs = MultimodalOps.videoPhash(spark, sf01).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    pairs.keys.foreach { case (a, b) =>
      assert(a < b)
      assert(a % 8 === 6 && b % 8 === 6, "population must be the video tag")
    }
    planted.foreach { case (a, b) =>
      // the surrogate header makes both members demux to the SAME
      // sample schedule — the construction the plant depends on
      assert(slots(a) === slots(b), s"planted schedule misaligned ($a,$b)")
      assert(slots(a).size >= 2, s"planted group ($a,$b) under 2 instants")
      val (fm, minH) = pairs.getOrElse((a, b),
        fail(s"planted pair ($a,$b) missing"))
      assert(fm === slots(a).size.toLong,
        "a planted pair must match on every shared instant")
      assert(minH <= 2, "the one perturbed body byte flips <= 2 bits")
    }
    // slice entry ≡ full pairs with both ends in the slice (signatures
    // are per-doc, so restricting the population restricts the pairs)
    val m = MultimodalOps.gateSliceModulus
    val r = MultimodalOps.gateSliceResidue
    val slicePairs = MultimodalOps.videoPhashSlice(spark, sf01).collect()
      .map(_.toString).sorted
    val fullRestricted = MultimodalOps.videoPhash(spark, sf01)
      .filter(col("doc_a") % m === r && col("doc_b") % m === r)
      .collect().map(_.toString).sorted
    assert(slicePairs.sameElements(fullRestricted))
  }
}
