package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructType}
import org.apache.spark.unsafe.Platform

/** Misra-Gries frequent-items sketch as an AGGREGATE — bounded-state
  * heavy-hitter candidates at any input cardinality.
  *
  * The exact formulation (`GROUP BY item HAVING count > n/φ`) shuffles
  * one row per DISTINCT item — at 100 TB with a 10⁹-key item domain
  * that is a full-width shuffle to find a handful of rows. This
  * aggregate keeps k counters per group TOTAL (Misra-Gries 1982):
  * update increments a held counter, admits into spare capacity, or
  * decrements ALL counters by the incoming weight's admissible share —
  * every decrement event destroys (k+1) units of mass (k counters +
  * the discarded increment), so total undercount D ≤ n/(k+1), and any
  * item with true count > n/(k+1) MUST survive with
  * est ∈ [count − n/(k+1), count]. Partial sketches run map-side
  * (ObjectHashAggregate) and merge by weighted re-insertion, which
  * preserves the same mass argument over the combined stream
  * (mergeable summaries, Agarwal et al. 2012) — the shuffle carries
  * ≤ k counters per mapper instead of the item domain.
  *
  * The SURVIVING SET and the estimates depend on arrival order and
  * merge shape (any MG implementation's do) — so composed operators
  * must treat the output as a CANDIDATE set: pick k > φ and the true
  * heavy hitters are provably all present, then an exact count of the
  * ≤ k candidates (a broadcast semi-join back onto the stream)
  * restores a deterministic, oracle-comparable result. That
  * sketch → verify composition is [[graft.operators.EventOps.heavyHitters]].
  *
  * Output: array<struct<item, est>> sorted (est desc, item asc) —
  * deterministic GIVEN the final counter map. Null items are skipped
  * (SQL aggregate convention).
  */
case class MisraGriesAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = kExpr

  private lazy val itemType = child.dataType
  private lazy val keyType = new StructType().add("item", itemType)
  lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(keyType)
  @transient private lazy val holder = new GenericInternalRow(1)
  @transient private lazy val itemOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(itemType).asInstanceOf[Ordering[Any]]

  override def checkInputDataTypes(): TypeCheckResult =
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "mg_topfreq k must be a foldable INT literal")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"mg_topfreq k must be > 0, got $k")
    else TypeUtils.checkForOrderingExpr(itemType, prettyName)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) {
      holder.update(0, v)
      buffer.add(toUnsafe(holder), 1L)
    }
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    other.foreach((key, c) => buffer.add(key, c))
    buffer
  }

  override def eval(buffer: MGSummary): Any = {
    val rows = buffer.entries.map { case (key, est) =>
      new GenericInternalRow(Array[Any](key.get(0, itemType), est))
    }
    val sorted = rows.sortWith { (a, b) =>
      val (ca, cb) = (a.getLong(1), b.getLong(1))
      if (ca != cb) ca > cb
      else itemOrd.lt(a.get(0, itemType), b.get(0, itemType))
    }
    new GenericArrayData(sorted.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): MGSummary = {
    val s = new MGSummary(k)
    val in = java.nio.ByteBuffer.wrap(storage)
    val n = in.getInt
    var off = 4
    var i = 0
    while (i < n) {
      val len = in.getInt(off)
      off += 4
      val row = new UnsafeRow(1)
      row.pointTo(storage, Platform.BYTE_ARRAY_OFFSET + off, len)
      off += len
      val c = in.getLong(off)
      off += 8
      s.put(row, c)
      i += 1
    }
    s
  }

  override def dataType: DataType = ArrayType(
    new StructType().add("item", itemType).add("est", LongType),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topfreq"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAgg =
    copy(child = newLeft, kExpr = newRight)
}

/** k-bounded counter map with the weighted Misra-Gries update — the
  * weighting is what makes partial sketches MERGEABLE (a merge is
  * just re-insertion of the other side's counters at their weights,
  * preserving the n/(k+1) mass bound over the combined stream). */
final class MGSummary(val k: Int) {
  private val counts = new java.util.HashMap[UnsafeRow, java.lang.Long]()

  /** Raw insert for deserialization — no eviction logic. */
  def put(key: UnsafeRow, c: Long): Unit = counts.put(key, c)

  def add(key: UnsafeRow, w: Long): Unit = {
    val cur = counts.get(key)
    if (cur != null) { counts.put(key, cur + w); return }
    if (counts.size < k) { counts.put(key.copy(), w); return }
    // full and absent: destroy the admissible share d = min(w, min
    // counter) from EVERY counter and from the incoming weight; if
    // weight survives, capacity has opened (the min counter died)
    var min = Long.MaxValue
    val it0 = counts.values().iterator()
    while (it0.hasNext) { val c = it0.next().longValue(); if (c < min) min = c }
    val d = math.min(w, min)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue() - d
      if (c <= 0) it.remove() else e.setValue(c)
    }
    val rest = w - d
    if (rest > 0) add(key, rest)
  }

  def size: Int = counts.size

  def foreach(f: (UnsafeRow, Long) => Unit): Unit =
    counts.forEach((key, c) => f(key, c.longValue()))

  def entries: Array[(UnsafeRow, Long)] = {
    val arr = new Array[(UnsafeRow, Long)](counts.size)
    var i = 0
    counts.forEach { (key, c) => arr(i) = (key, c.longValue()); i += 1 }
    arr
  }
}

object FreqColumns {
  /** `mgTopFreq(item, k)` — Misra-Gries candidate counters: every item
    * with true count > n/(k+1) is guaranteed present, estimates
    * undercount by at most n/(k+1). Treat as candidates; verify
    * exactly (see [[graft.operators.EventOps.heavyHitters]]). */
  def mgTopFreq(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(c), Literal(k)).toAggregateExpression())
}
