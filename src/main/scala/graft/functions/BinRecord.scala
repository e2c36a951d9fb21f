package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A compact structured binary record codec — the stand-in for the
  * reference's protobuf record sample
  * (solace-apache-beam-samples/.../SolaceProtoBuffRecordTest.java:
  * messages carry a serialized typed record that the mapper decodes).
  * No protobuf lib ships in this container, so the wire format is a
  * deterministic fixed layout:
  *
  *   magic "GR" (2B) | version (1B) | id (8B BE) | value (8B BE double)
  *   | tagLen (4B BE) | tag (UTF-8 bytes)
  *
  * Decode is a custom Catalyst expression (single static call in
  * codegen) returning a struct — the mapper is a projection, not a
  * per-record lambda.
  */
object BinRecord {
  val MAGIC0: Byte = 'G'
  val MAGIC1: Byte = 'R'
  val VERSION: Byte = 1

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  def encode(id: Long, value: Double, tag: String): Array[Byte] = {
    val tagBytes = tag.getBytes(StandardCharsets.UTF_8)
    val buf = ByteBuffer.allocate(2 + 1 + 8 + 8 + 4 + tagBytes.length)
    buf.put(MAGIC0).put(MAGIC1).put(VERSION)
    buf.putLong(id).putDouble(value).putInt(tagBytes.length)
    buf.put(tagBytes)
    buf.array()
  }

  /** Strict decode: malformed payloads throw (bad records should fail
    * loudly in a pipeline; wrap with try_* semantics upstream if
    * tolerance is wanted). */
  def decode(bytes: Array[Byte]): InternalRow = {
    require(bytes.length >= 23 && bytes(0) == MAGIC0 && bytes(1) == MAGIC1,
      s"not a GR record (${bytes.length} bytes)")
    require(bytes(2) == VERSION, s"unsupported GR version ${bytes(2)}")
    val buf = ByteBuffer.wrap(bytes, 3, bytes.length - 3)
    val id = buf.getLong()
    val value = buf.getDouble()
    val len = buf.getInt()
    val tag = new Array[Byte](len)
    buf.get(tag)
    new GenericInternalRow(Array[Any](id, value, UTF8String.fromBytes(tag)))
  }
}

case class DecodeBinRecord(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireBinary("decode_bin_record", child.dataType)
  override def dataType: DataType = BinRecord.schema

  override def nullSafeEval(input: Any): Any =
    BinRecord.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BinRecord$$.MODULE$$.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeBinRecord =
    copy(child = newChild)
}

object BinRecordColumns {
  def decodeRecord(payload: Column): Column =
    GraftBridge.column(DecodeBinRecord(GraftBridge.expression(payload)))
}
