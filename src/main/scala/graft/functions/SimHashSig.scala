package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass 64-bit SimHash over a shingle array.
  *
  * Replaces the explode → xxhash64 → 64 conditional-sum aggregate
  * pipeline with a single scalar projection: each shingle is hashed
  * once (XXH64, seed 42 — bit-identical to Spark's `xxhash64`), its
  * bits vote ±1 into 64 counters, and the signature packs the positive
  * counters. Computing the signature in the SCAN stage makes it narrow
  * map-side work — the per-document shuffle the aggregate formulation
  * needed (64 longs per doc partial) disappears entirely, and only the
  * band join shuffles.
  *
  * Votes are commutative integer sums, so the result is independent of
  * shingle order and exactly equals the aggregate formulation.
  */
object SimHashKernel {
  def sig(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) { // null elements contribute nothing (vs an NPE)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireArrayOfString("simhash_sig", child.dataType)

  override def nullSafeEval(input: Any): Any =
    SimHashKernel.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel$$.MODULE$$.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSigColumns {
  def simhashSig(shingles: Column): Column =
    GraftBridge.column(SimHashSig(GraftBridge.expression(shingles)))
}
