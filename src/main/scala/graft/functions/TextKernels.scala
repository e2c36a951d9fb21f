package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop text kernel: distinct word-3-gram shingles straight from
  * the raw string.
  *
  * The composable form — `array_distinct(transform(sequence(...),
  * concat_ws(...)))` over `filter(split(...))` — evaluates the
  * higher-order lambdas interpreted, per token, per row; on the dedup
  * suite that single projection dominated the whole pipeline (~6s per
  * DAG branch at sf0.1, recomputed by every branch). This expression
  * emits ONE static call and builds the shingle set in a single pass.
  *
  * Semantics contract (must stay aligned with the DuckDB oracle in
  * DedupOps.jaccardSql): tokens = text split on single space, empties
  * dropped; shingles = consecutive token triples joined with a space;
  * distinct, first-occurrence order.
  */
object TextKernel {
  /** Whitespace tokens (split on single space, empties dropped) —
    * same single-pass rationale as the shingle kernel; feeds every
    * wordcount-family operator. */
  def tokens(text: UTF8String): ArrayData = {
    val raw = text.toString.split(" ", -1)
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    val out = new Array[Any](n)
    i = 0; var j = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { out(j) = UTF8String.fromString(raw(i)); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Max per-token occurrence count — the Gopher top-word statistic as
    * one hash-counting pass (counts are equality-grouped, so the
    * result is independent of any ordering). The composable forms are
    * far worse at scale: explode + two-level aggregate ships token
    * volume through two exchanges, and an `aggregate(array_sort(...))`
    * fold evaluates its lambda interpreted per token AND knocks the
    * projection out of whole-stage codegen. */
  def topTokenCount(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val prev = counts.get(t)
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(t, Integer.valueOf(c))
      if (c > best) best = c
      i += 1
    }
    best.toLong
  }

  /** The Gopher-style repetition keep rule fused into ONE pass over
    * the raw string: tokenize, top-word count, and distinct-adjacent-
    * bigram count in a single traversal, returning the boolean the
    * training pipeline filters on.
    *
    * Why a fused kernel and not the composable predicate
    * (`size(w) > 0 && topCount(w)/size(w) <= … && dup2(w) <= …`):
    * FilterExec codegen splits conjuncts for null short-circuiting
    * and does NOT share subexpressions across them, so the composed
    * predicate re-tokenizes and re-builds the bigram array once per
    * conjunct — measured at 3× the cost of this kernel on the
    * pipeline's corpus scan. Fusing also skips materializing the
    * bigram STRING array entirely (the bigram set dedups pair
    * strings built on the fly).
    *
    * Semantics contract (must stay bit-aligned with
    * [[graft.operators.TextOps.docRepetition]]'s metrics and its
    * DuckDB oracle): tokens = split on single space, empties
    * dropped; zero tokens → false; top-word share = topCount/n as
    * double division of exact ints; n2 = n−1; one token (n2 = 0) →
    * false (the composed predicate's null dup-fraction semantics);
    * dup2 = (n2 − u2)/n2 with u2 = distinct space-joined adjacent
    * pairs (space-join is injective here — tokens cannot contain
    * spaces). */
  def repetitionKeep(text: UTF8String, topMax: Double, dupMax: Double): Boolean = {
    val raw = text.toString.split(" ", -1)
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) { raw(nTok) = raw(i); nTok += 1 }; i += 1 }
    if (nTok == 0) return false
    val counts = new java.util.HashMap[String, Integer](nTok * 2)
    var best = 0
    i = 0
    while (i < nTok) {
      val prev = counts.get(raw(i))
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(raw(i), Integer.valueOf(c))
      if (c > best) best = c
      i += 1
    }
    if (best.toDouble / nTok.toDouble > topMax) return false
    val n2 = nTok - 1
    if (n2 <= 0) return false
    val pairs = new java.util.HashSet[String](n2 * 2)
    i = 0
    while (i < n2) { pairs.add(raw(i) + " " + raw(i + 1)); i += 1 }
    (n2 - pairs.size).toDouble / n2.toDouble <= dupMax
  }

  def distinctShingles3(text: UTF8String): ArrayData = {
    val raw = text.toString.split(" ", -1)
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) { raw(nTok) = raw(i); nTok += 1 }; i += 1 }
    if (nTok < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](nTok * 2)
    i = 0
    while (i <= nTok - 3) {
      seen.add(raw(i) + " " + raw(i + 1) + " " + raw(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Valid non-surrogate code point → its string; anything else → ""
    * (callers pre-gate, the fallback just keeps codegen throw-free). */
  def codePointChar(cp: Long): UTF8String =
    if (cp >= 1L && cp <= 0x10FFFFL && !(cp >= 0xD800L && cp <= 0xDFFFL))
      UTF8String.fromString(new String(Character.toChars(cp.toInt)))
    else UTF8String.EMPTY_UTF8
}

case class WsTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireString("ws_tokens", child.dataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernel.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel$$.MODULE$$.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

case class DistinctShingles3(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireString("distinct_shingles3", child.dataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernel.distinctShingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel$$.MODULE$$.distinctShingles3($c)")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles3 =
    copy(child = newChild)
}

case class TopTokenCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOfString("top_token_count", child.dataType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    TextKernel.topTokenCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel$$.MODULE$$.topTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

/** Thresholds ride as constructor params, not child expressions — they
  * are operator constants (the keep rule's identity), and keeping the
  * expression unary keeps the generated call site a single static
  * invocation. */
case class RepetitionKeep(child: Expression, topMax: Double, dupMax: Double)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireString("repetition_keep", child.dataType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    TextKernel.repetitionKeep(input.asInstanceOf[UTF8String], topMax, dupMax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel$$.MODULE$$.repetitionKeep($c, $topMax, $dupMax)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionKeep =
    copy(child = newChild)
}

/** Unicode code point → its one-character string — what the HTML
  * numeric-character-reference decode needs and Spark's builtin `chr`
  * cannot do (chr is ASCII/mod-256 by contract). Callers gate the
  * range to valid non-surrogate code points (1..0x10FFFF minus
  * D800..DFFF); the kernel itself also degrades to "" out of range so
  * no input can throw inside codegen. */
case class CodePointChar(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireLong("code_point_char", child.dataType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernel.codePointChar(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel$$.MODULE$$.codePointChar($c)")

  override protected def withNewChildInternal(newChild: Expression): CodePointChar =
    copy(child = newChild)
}

object TextKernels {
  def codePointChar(cp: Column): Column =
    GraftBridge.column(CodePointChar(GraftBridge.expression(cp)))

  def distinctShingles3(text: Column): Column =
    GraftBridge.column(DistinctShingles3(GraftBridge.expression(text)))

  def wsTokens(text: Column): Column =
    GraftBridge.column(WsTokens(GraftBridge.expression(text)))

  def topTokenCount(tokens: Column): Column =
    GraftBridge.column(TopTokenCount(GraftBridge.expression(tokens)))

  def repetitionKeep(text: Column, topMax: Double, dupMax: Double): Column =
    GraftBridge.column(RepetitionKeep(GraftBridge.expression(text), topMax, dupMax))
}
