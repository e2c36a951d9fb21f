package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature over a shingle array.
  *
  * Each element is hashed ONCE with XXH64 (the same kernel behind
  * Spark's `xxhash64`), then the k hash-family members are derived by
  * splitmix64-mixing the base hash with a per-function seed — the
  * standard "one strong hash + k mixes" construction. Versus k
  * separate `min(xxhash64(i, s))` aggregate columns this is one
  * projection instead of a 128-wide aggregate: k×fewer string hashes
  * and no wide-row shuffle.
  *
  * LSH candidate sets depend on this hash family, but the exact-
  * Jaccard verification step makes the final output independent of it
  * — the DuckDB oracle is unchanged.
  */
object MinHashKernel {
  val numHashes = 128

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def sig(arr: ArrayData): ArrayData = {
    val k = numHashes
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) { // null elements contribute nothing (vs an NPE)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < k) {
          val h = splitmix64(base ^ (j.toLong * 0xA24BAED4963EE407L))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireArrayOfString("minhash_sig", child.dataType)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel$$.MODULE$$.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSigColumns {
  def minhashSig(shingles: Column): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles)))
}
