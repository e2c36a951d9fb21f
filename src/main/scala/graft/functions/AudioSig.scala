package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit windowed energy-contour signature over a PCM byte region —
  * the published acoustic-fingerprint idea (chromaprint's shape: hash
  * bit = "does the next time window carry more energy than this one",
  * robust to gain changes and small local edits) applied to the
  * library's stubbed decode contract, exactly as [[DHashKernel]]
  * applies dHash to the stubbed pixel region: the "PCM samples" are
  * the payload's data bytes (u8, bias 128), and the 65 windows are
  * equal fractions of the region. A real deployment swaps the byte
  * reader for a true PCM decoder + spectral frontend at the same
  * signature shape; everything downstream (banding, Hamming verify,
  * thresholds) is decoder-agnostic.
  *
  * Window geometry: for CBR PCM, equal fractions of the byte extent
  * ARE equal fractions of media time, so the signature is
  * SAMPLE-RATE-INVARIANT by construction — the same contour at
  * 8 kHz and 40 kHz (uniform resampling) yields the same window
  * energies up to scale, and the hash compares, never measures.
  * Bit k (k = 0..63) is set iff E(k) < E(k+1) where E(w) =
  * Σ (byte − 128)² over window w — so a single-byte edit perturbs one
  * window's energy and flips at most the two bits that compare it
  * (the local-edit bound the planted near-dup pairs rely on).
  *
  * One scalar pass in the SCAN stage (the [[DHashKernel]] rationale):
  * no per-window explode, no aggregate shuffle — only the band join
  * shuffles. Integer sums and compares are exactly reproducible in
  * the DuckDB oracle, so the operator carries a full hash gate.
  */
object AudioPhashKernel {
  /** 65 windows → 64 adjacent-pair compare bits. */
  val windows = 65

  /** Minimum data bytes for a meaningful signature: one byte per
    * window (below it, floor division makes some windows empty and
    * their zero energy is noise, not contour). */
  val minSamples: Int = windows

  def hash(b: Array[Byte], off: Int): Long = {
    val n = b.length - off
    var out = 0L
    var e0 = energy(b, off, n, 0)
    var k = 0
    while (k < windows - 1) {
      val e1 = energy(b, off, n, k + 1)
      if (e0 < e1) out |= (1L << k)
      e0 = e1
      k += 1
    }
    out
  }

  /** Window w's energy: Σ (byte − 128)² over the byte span
    * [⌊w·n/65⌋, ⌊(w+1)·n/65⌋) of the region at `off`. */
  private def energy(b: Array[Byte], off: Int, n: Int, w: Int): Long = {
    var j = off + (w.toLong * n / windows).toInt
    val end = off + ((w + 1).toLong * n / windows).toInt
    var s = 0L
    while (j < end) {
      val v = (b(j) & 0xFF) - 128
      s += (v * v).toLong
      j += 1
    }
    s
  }
}

/** `audiophash64(bin, off)` — the signature over `bin`'s bytes from
  * fixed offset `off` (the container's PCM-data start). Codegen'd
  * scalar; callers gate `length(bin) >= off + AudioPhashKernel
  * .minSamples`. */
case class AudioPhash64(child: Expression, off: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.requireBinary("audiophash64", child.dataType)

  override def nullSafeEval(input: Any): Any =
    AudioPhashKernel.hash(input.asInstanceOf[Array[Byte]], off)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioPhashKernel$$.MODULE$$.hash($c, $off)")

  override protected def withNewChildInternal(newChild: Expression): AudioPhash64 =
    copy(child = newChild)
}

object AudioPhashColumns {
  def audiophash64(bin: Column, off: Int): Column =
    GraftBridge.column(AudioPhash64(GraftBridge.expression(bin), off))
}
