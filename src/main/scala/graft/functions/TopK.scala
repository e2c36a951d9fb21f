package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructType}
import org.apache.spark.unsafe.Platform

/** Bounded top-k as an AGGREGATE — the scale-correct form of
  * "top N rows per group".
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * v DESC) <= k`, [[graft.operators.Relational.topNWindow]]) shuffles
  * EVERY input row to its group's partition and sorts the whole
  * partition before discarding all but k rows — at 100 TB with 10³
  * rows per group that is a full-data shuffle plus a full sort to keep
  * 0.3% of it. This aggregate keeps a k-row min-heap per group
  * instead: partial aggregation runs map-side (ObjectHashAggregate),
  * so the shuffle carries at most k serialized rows per (mapper,
  * group) — shuffle volume drops by ~rows-per-group/k — and no sort
  * ever sees more than the k retained rows per heap. merge() is
  * associative and commutative, so partial heaps combine in any
  * order; the result is exact, not approximate.
  *
  * Semantics: retains the k LARGEST struct values under the struct's
  * lexicographic field ordering (Spark's own struct ordering — the
  * one ORDER BY uses), output array sorted descending. Callers encode
  * direction by negating fields (e.g. `struct(price, -id)` = price
  * DESC, id ASC) and make the order total with a unique tiebreaker so
  * results are deterministic and oracle-comparable. Null structs are
  * skipped; null FIELDS order first (Spark's null-smallest), so they
  * lose ties for "largest" exactly as ORDER BY ... DESC NULLS LAST
  * would.
  */
case class TopKStructs(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = kExpr

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  @transient private lazy val ord: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType)
      .asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case s: StructType =>
        if (!kExpr.foldable || kExpr.dataType != IntegerType)
          TypeCheckResult.TypeCheckFailure(
            "topk_structs k must be a foldable INT literal")
        else if (k <= 0)
          TypeCheckResult.TypeCheckFailure(s"topk_structs k must be > 0, got $k")
        else TypeUtils.checkForOrderingExpr(s, prettyName)
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"topk_structs takes a STRUCT column, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k, ord)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) {
      // normalize to an owned UnsafeRow: heap entries outlive the
      // scan's reused row buffers, and serialize() needs raw bytes
      buffer.insert(toUnsafe(v.asInstanceOf[InternalRow]).copy())
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach(buffer.insert)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { r =>
      val bytes = r.asInstanceOf[UnsafeRow].getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): TopKHeap = {
    // ByteBuffer defaults to big-endian, matching DataOutputStream on
    // the write side
    val heap = new TopKHeap(k, ord)
    val in = java.nio.ByteBuffer.wrap(storage)
    val n = in.getInt
    var off = 4
    var i = 0
    while (i < n) {
      val len = in.getInt(off)
      off += 4
      val row = new UnsafeRow(structType.size)
      row.pointTo(storage, Platform.BYTE_ARRAY_OFFSET + off, len)
      heap.insert(row)
      off += len
      i += 1
    }
    heap
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_structs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKStructs =
    copy(child = newLeft, kExpr = newRight)
}

/** k-bounded min-heap of struct rows: the root is the SMALLEST
  * retained value, so admission is one compare against the root and
  * the heap never holds more than k rows — fixed memory per group
  * regardless of group size. */
final class TopKHeap(k: Int, ord: Ordering[InternalRow]) {
  private val q = new java.util.PriorityQueue[InternalRow](k, ord)

  def insert(r: InternalRow): Unit = {
    if (q.size < k) q.add(r)
    else if (ord.compare(r, q.peek) > 0) { q.poll(); q.add(r) }
  }

  def size: Int = q.size

  def foreach(f: InternalRow => Unit): Unit = q.forEach(r => f(r))

  /** Retained rows, largest first. */
  def sortedDesc: Array[InternalRow] = {
    val arr = q.toArray(new Array[InternalRow](q.size))
    java.util.Arrays.sort(arr, ord.reverse)
    arr
  }
}

object TopKColumns {
  /** `topKStructs(struct(sortFields..., payload...), k)` — aggregate
    * to the k largest structs, descending. Make the sort prefix a
    * TOTAL order (append a unique tiebreaker) for deterministic
    * output. */
  def topKStructs(s: Column, k: Int): Column =
    GraftBridge.column(
      TopKStructs(GraftBridge.expression(s), Literal(k)).toAggregateExpression())
}
