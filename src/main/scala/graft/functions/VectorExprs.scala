package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Tight-loop vector kernels behind custom Catalyst expressions.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions evaluate
  * interpreted (lambda per element). Why not an unrolled 64-term
  * expression chain: whole-stage codegen inlines it at every use site
  * and the generated method blows the JVM 64KB limit, silently
  * disabling codegen for the whole stage. A BinaryExpression whose
  * doGenCode emits ONE static call keeps the stage inside codegen and
  * the loop JIT-compiles once.
  *
  * Determinism: a sequential left-to-right accumulation starting at
  * 0.0 — bit-identical to DuckDB's `list_reduce(list_prepend(0.0,
  * list_zip ...))` oracle fold, so no rounding is needed anywhere.
  */
object VecOps {
  private def checkLengths(a: ArrayData, b: ArrayData): Unit =
    if (a.numElements() != b.numElements())
      // an UnsafeArrayData read past numElements() returns adjacent
      // memory — silent garbage; mismatched dims must fail loudly
      throw new IllegalArgumentException(
        s"vector length mismatch: ${a.numElements()} vs ${b.numElements()}")

  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    checkLengths(a, b)
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xa: Double = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val xb: Double = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += xa * xb
      i += 1
    }
    acc
  }

  def distSq(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    checkLengths(a, b)
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xa: Double = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val xb: Double = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = xa - xb
      acc += d * d
      i += 1
    }
    acc
  }
}

sealed abstract class VecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // SQL-registered (GraftExtensions) → wrong-typed args must fail
  // analysis with a message, not throw ClassCastException at codegen
  // (same convention as MinHashSig/SimHashSig via TypeChecks)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float>/array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def kernel: String // static method name on VecOps

  @transient protected lazy val lf: Boolean = isFloat(left)
  @transient protected lazy val rf: Boolean = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    if (kernel == "dot") VecOps.dot(ad, lf, bd, rf) else VecOps.distSq(ad, lf, bd, rf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecOps$$.MODULE$$.$kernel($a, $lf, $b, $rf)")
}

/** Sequential dot product of two numeric arrays → double. */
case class VecDot(left: Expression, right: Expression) extends VecBinary {
  override protected def kernel: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Sequential squared euclidean distance of two numeric arrays. */
case class VecDistSq(left: Expression, right: Expression) extends VecBinary {
  override protected def kernel: String = "distSq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDistSq =
    copy(left = l, right = r)
}

object VectorExprs {
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def vecDistSq(a: Column, b: Column): Column =
    GraftBridge.column(VecDistSq(GraftBridge.expression(a), GraftBridge.expression(b)))

  def vecNorm(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(vecDot(v, v))
}
