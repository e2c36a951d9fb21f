package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque feature vector produced by the (stubbed) decoder. */
final case class MmFeature(
    doc_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    byte_len: Long,
    hist: Array[Long])

/** Multimodal-column plumbing: treat media as opaque `binary` columns
  * with typed metadata, decoded by batched per-partition workers.
  *
  * The real decode (image/audio libs) is STUBBED — this container has
  * no codecs — but everything Spark-side is real and tested: the
  * binary column, the metadata extraction (codegen'd expressions), the
  * mapPartitions batching shape a native decoder plugs into, and the
  * output schema. Swap [[MultimodalOps.stubDecode]] for a JNI/FFI call
  * and nothing else changes.
  */
object MultimodalOps {

  /** Typed metadata over a binary payload column — all plain Catalyst
    * expressions (byte length, magic header hex, md5 digest, byte-sum
    * checksum), fully pushdown/codegen friendly. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        hex(substring(col("text"), 1, 4).cast("binary")).as("magic"),
        md5(col("text").cast("binary")).as("digest"),
        aggregate(transform(split(col("text"), ""), c => ascii(c)),
          lit(0L), (acc, x) => acc + x).as("checksum"))

  val binaryMetaSql: String =
    """SELECT doc_id,
      | octet_length(encode(text)) AS byte_len,
      | hex(encode(substring(text, 1, 4))) AS magic,
      | md5(text) AS digest,
      | CAST(list_sum(list_transform(string_split(text, ''), c -> ord(c))) AS BIGINT) AS checksum
      |FROM documents""".stripMargin

  /** ======== STUB ========
    * Deterministic fake "decode": pretends the payload is an image
    * whose dimensions derive from header bytes, and emits a 16-bin
    * byte histogram as the "feature". A real deployment replaces this
    * function body with an actual codec call; signature and batching
    * stay identical. */
  def stubDecode(docId: Long, payload: Array[Byte]): MmFeature = {
    val w = 64 + (if (payload.length > 0) (payload(0) & 0x3F) else 0)
    val h = 64 + (if (payload.length > 1) (payload(1) & 0x3F) else 0)
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) >> 4) += 1
      i += 1
    }
    MmFeature(docId, w, h, 3, payload.length.toLong, hist)
  }

  val decodeBatchSize = 64

  /** Batched decode over partitions: the shape a vectorized native
    * decoder needs — fixed-size batches inside each partition, no
    * driver involvement, output is a typed Dataset. */
  def featureExtract(spark: SparkSession, dir: String): Dataset[MmFeature] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.grouped(decodeBatchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.map { case (id, payload) => stubDecode(id, payload) }
        }
      }
  }

  /** Gate-facing projection: the 16-bin histogram as scalar columns
    * (`hist_0..hist_15`) — array columns are not sortable by the
    * cross-engine comparator, scalars are. */
  def featureExtractDf(spark: SparkSession, dir: String): DataFrame = {
    val base = featureExtract(spark, dir).toDF()
    val histCols = (0 until 16).map(i => element_at(col("hist"), i + 1).as(s"hist_$i"))
    base.select(
      Seq(col("doc_id"), col("width"), col("height"), col("channels"), col("byte_len"))
        ++ histCols: _*)
  }

  /** Frame sampling over an opaque media payload — the video-pipeline
    * plumbing shape: treat the payload as fixed-size frames, keep every
    * `frameStride`-th frame, emit typed per-frame rows (index, offset,
    * digest). One `posexplode(sequence(...))` per document: rows scale
    * with frames kept, the payload is never copied per frame beyond the
    * projected slice, and everything stays in whole-stage codegen. A
    * real decoder replaces the substring slice with a codec call at the
    * same batch shape. */
  val frameBytes = 32
  val frameStride = 4

  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val nFrames = floor((length(col("text")) + frameBytes - 1) / frameBytes)
    val kept = floor((nFrames + frameStride - 1) / frameStride).cast("int")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), kept.as("n_kept"))
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0), col("n_kept") - 1)).as(Seq("frame_idx", "k")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        (col("k").cast("long") * frameStride * frameBytes).as("byte_offset"),
        md5(substring(col("text"),
          (col("k").cast("long") * frameStride * frameBytes + 1).cast("int"), lit(frameBytes))
          .cast("binary")).as("frame_digest"))
  }

  val frameSampleSql: String =
    s"""WITH t AS (
       | SELECT doc_id, text,
       |  CAST(floor((length(text) + $frameBytes - 1) / $frameBytes) AS BIGINT) AS n_frames
       | FROM documents),
       |k AS (
       | SELECT doc_id, text,
       |  CAST(floor((n_frames + $frameStride - 1) / $frameStride) AS BIGINT) AS n_kept
       | FROM t WHERE n_frames > 0),
       |f AS (
       | SELECT doc_id, text,
       |  unnest(generate_series(0, CAST(n_kept - 1 AS BIGINT))) AS i
       | FROM k)
       |SELECT doc_id,
       | CAST(i AS BIGINT) AS frame_idx,
       | CAST(i * $frameStride * $frameBytes AS BIGINT) AS byte_offset,
       | md5(substring(text, CAST(i * $frameStride * $frameBytes + 1 AS INT), $frameBytes)) AS frame_digest
       |FROM f""".stripMargin

  /** The stub decode is deterministic byte math, so it has an exact
    * SQL oracle: per-bin counts of `byte >> 4`, dims from header bytes. */
  val featureStubSql: String = {
    val hist = (0 until 16)
      .map(b => s"CAST(len(list_filter(bytes, x -> x // 16 = $b)) AS BIGINT) AS hist_$b")
      .mkString(",\n ")
    s"""WITH t AS (
       | SELECT doc_id, list_transform(string_split(text, ''), c -> ord(c)) AS bytes
       | FROM documents)
       |SELECT doc_id,
       | CAST(64 + CASE WHEN len(bytes) > 0 THEN bytes[1] % 64 ELSE 0 END AS INTEGER) AS width,
       | CAST(64 + CASE WHEN len(bytes) > 1 THEN bytes[2] % 64 ELSE 0 END AS INTEGER) AS height,
       | CAST(3 AS INTEGER) AS channels,
       | CAST(len(bytes) AS BIGINT) AS byte_len,
       | $hist
       |FROM t""".stripMargin
  }
}
