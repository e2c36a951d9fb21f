package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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
}

case class WsTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernel.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel$$.MODULE$$.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

case class DistinctShingles3(child: Expression) extends UnaryExpression {
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
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    TextKernel.topTokenCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernel$$.MODULE$$.topTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

object TextKernels {
  def distinctShingles3(text: Column): Column =
    GraftBridge.column(DistinctShingles3(GraftBridge.expression(text)))

  def wsTokens(text: Column): Column =
    GraftBridge.column(WsTokens(GraftBridge.expression(text)))

  def topTokenCount(tokens: Column): Column =
    GraftBridge.column(TopTokenCount(GraftBridge.expression(tokens)))
}
