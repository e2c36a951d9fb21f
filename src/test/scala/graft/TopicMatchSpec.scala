package graft

import graft.functions.TopicMatch
import org.scalatest.funsuite.AnyFunSuite

/** Solace wildcard semantics: `*` = exactly one whole level (or a
  * level prefix when trailing a literal), `>` = one-or-more trailing
  * levels, only in final position. */
class TopicMatchSpec extends AnyFunSuite {
  private def m(sub: String, topic: String) = TopicMatch.matches(sub, topic)

  test("exact match") {
    assert(m("a/b/c", "a/b/c"))
    assert(!m("a/b/c", "a/b/d"))
    assert(!m("a/b/c", "a/b"))
    assert(!m("a/b", "a/b/c"))
  }

  test("* matches exactly one level") {
    assert(m("a/*/c", "a/b/c"))
    assert(m("a/*/c", "a/xyz/c"))
    assert(!m("a/*/c", "a/b/x/c"))
    assert(!m("a/*", "a"))
    assert(m("a/*", "a/anything"))
    assert(!m("a/*", "a/b/c"))
  }

  test("trailing * inside a level is a prefix match") {
    assert(m("a/ab*/c", "a/abc/c"))
    assert(m("a/ab*/c", "a/ab/c"))
    assert(!m("a/ab*/c", "a/xb/c"))
  }

  test("> matches one or more trailing levels") {
    assert(m("a/>", "a/b"))
    assert(m("a/>", "a/b/c/d"))
    assert(!m("a/>", "a"))
    assert(m(">", "a"))
    assert(m(">", "a/b"))
  }

  test("> only terminal; literal > mid-pattern matches literally") {
    assert(!m("a/>/c", "a/b/c") || m("a/>/c", "a/>/c"))
    assert(m("a/>/c", "a/>/c"))
  }

  test("codegen'd predicate agrees with the Scala impl") {
    import org.apache.spark.sql.functions._
    import graft.functions.TopicMatches.topicMatches
    val spark = SparkSpec.spark
    import spark.implicits._
    val rows = Seq(
      ("a/>", "a/b/c"), ("a/*/c", "a/b/c"), ("a/*/c", "a/b/d"),
      ("events/purch*/u3", "events/purchase/u3"), ("x/y", "x/y"))
    val got = rows.toDF("sub", "topic")
      .withColumn("hit", topicMatches(col("sub"), col("topic")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq
    got.foreach { case (s, t, hit) => assert(hit === TopicMatch.matches(s, t), s"$s vs $t") }
  }
}
