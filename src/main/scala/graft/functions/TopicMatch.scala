package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** Solace-style topic subscription matching.
  *
  * Semantics (per Solace "Wildcard Characters in Topic Subscriptions",
  * exercised by the reference connector's queue subscriptions —
  * /root/reference/beam-sdks-java-io-solace/src/main/java/com/solace/
  * connector/beam/UnboundedSolaceReader.java binds queues whose topic
  * subscriptions use these rules):
  *  - topics are `/`-separated levels;
  *  - a subscription level `*` matches exactly one whole level;
  *  - a level ending in `*` (e.g. `ab*`) prefix-matches one level;
  *  - a final level `>` matches one or more remaining levels.
  */
object TopicMatch {
  def matches(sub: UTF8String, topic: UTF8String): Boolean =
    matches(sub.toString, topic.toString)

  def matches(sub: String, topic: String): Boolean = {
    val sl = sub.split("/", -1)
    val tl = topic.split("/", -1)
    var i = 0
    while (i < sl.length) {
      val s = sl(i)
      if (s == ">" && i == sl.length - 1) return tl.length > i
      if (i >= tl.length) return false
      val t = tl(i)
      if (s != "*" && s != t) {
        if (s.nonEmpty && s.charAt(s.length - 1) == '*') {
          if (!t.startsWith(s.substring(0, s.length - 1))) return false
        } else return false
      }
      i += 1
    }
    tl.length == sl.length
  }
}

/** Catalyst predicate `topic_matches(subscription, topic)`.
  *
  * Stays inside whole-stage codegen: the generated code is a single
  * static JVM call, so routing filters over billions of messages never
  * fall back to interpreted evaluation or a Scala UDF.
  */
case class TopicMatches(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireString("topic_matches", left.dataType) match {
      case TypeCheckResult.TypeCheckSuccess =>
        TypeChecks.requireString("topic_matches", right.dataType)
      case fail => fail
    }

  override def nullSafeEval(sub: Any, topic: Any): Any =
    TopicMatch.matches(sub.asInstanceOf[UTF8String], topic.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, t) => s"graft.functions.TopicMatch.matches($s, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopicMatches =
    copy(left = newLeft, right = newRight)
}

object TopicMatches {
  import org.apache.spark.sql.GraftBridge
  /** Column-API entry point. */
  def topicMatches(sub: Column, topic: Column): Column =
    GraftBridge.column(
      TopicMatches(GraftBridge.expression(sub), GraftBridge.expression(topic)))
}
