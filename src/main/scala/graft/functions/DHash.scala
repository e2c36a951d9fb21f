package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit sampled difference hash (dHash) over a raw byte region —
  * the published perceptual-signature idea (hash bit = "is the next
  * grid sample brighter than this one", robust to uniform brightness
  * and small local edits) applied to the library's stubbed decode
  * contract: the "grayscale image" is the payload's pixel bytes, and
  * the 9×8 resize is a deterministic 72-point sampling of that
  * region (sample s reads the byte at `off + ⌊s·plen/72⌋`). A real
  * deployment swaps the sampler for a true decoder+resampler at the
  * same signature shape; everything downstream (banding, Hamming
  * verify, thresholds) is decoder-agnostic.
  *
  * One scalar pass in the SCAN stage (the [[SimHashKernel]]
  * rationale): no per-pixel explode, no aggregate shuffle — only the
  * band join shuffles. Bit k (k = 8·row + col) is set iff
  * g(row, col) < g(row, col+1) on the 9-wide/8-tall grid; integer
  * sampling and unsigned byte compares are exactly reproducible in
  * the DuckDB oracle, so the operator carries a full hash gate
  * (unlike the xxhash-based [[SimHashKernel]] signatures).
  */
object DHashKernel {
  val gridW = 9
  val gridH = 8
  val samples: Int = gridW * gridH // 72

  /** Minimum pixel bytes for a meaningful signature: one byte per
    * grid sample (below it, neighboring samples alias to the same
    * byte and the hash degenerates toward 0). */
  val minPixels: Int = samples

  def hash(b: Array[Byte], off: Int): Long = {
    val plen = b.length - off
    var out = 0L
    var r = 0
    while (r < gridH) {
      var c = 0
      while (c < gridW - 1) {
        val s1 = r * gridW + c
        val g1 = b(off + ((s1.toLong * plen) / samples).toInt) & 0xFF
        val g2 = b(off + (((s1 + 1).toLong * plen) / samples).toInt) & 0xFF
        if (g1 < g2) out |= (1L << (r * (gridW - 1) + c))
        c += 1
      }
      r += 1
    }
    out
  }
}

/** `dhash64(bin, off)` — the signature over `bin`'s bytes from fixed
  * offset `off` (the container's pixel-data start). Codegen'd scalar;
  * callers gate `length(bin) >= off + DHashKernel.minPixels`. */
case class DHash64(child: Expression, off: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireBinary("dhash64", child.dataType)

  override def nullSafeEval(input: Any): Any =
    DHashKernel.hash(input.asInstanceOf[Array[Byte]], off)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DHashKernel$$.MODULE$$.hash($c, $off)")

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

object DHashColumns {
  def dhash64(bin: Column, off: Int): Column =
    GraftBridge.column(DHash64(GraftBridge.expression(bin), off))
}
