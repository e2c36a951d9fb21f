package graft

import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the custom expressions: after registration,
  * `topic_matches`, `vec_dot`, `vec_dist_sq`, `distinct_shingles3`,
  * and `decode_gr_record` are callable from `spark.sql(...)` — the
  * whole engine is usable from pure SQL, not just the Scala API.
  *
  * Two registration paths:
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` (cluster
  *    deployment, applies to every session), or
  *  - `GraftFunctions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  val descriptors: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("topic_matches",
      new ExpressionInfo(classOf[TopicMatches].getName, "topic_matches"),
      (es: Seq[Expression]) => TopicMatches(es(0), es(1))),
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))),
    ("vec_dist_sq",
      new ExpressionInfo(classOf[VecDistSq].getName, "vec_dist_sq"),
      (es: Seq[Expression]) => VecDistSq(es(0), es(1))),
    ("distinct_shingles3",
      new ExpressionInfo(classOf[DistinctShingles3].getName, "distinct_shingles3"),
      (es: Seq[Expression]) => DistinctShingles3(es(0))),
    ("decode_gr_record",
      new ExpressionInfo(classOf[DecodeBinRecord].getName, "decode_gr_record"),
      (es: Seq[Expression]) => DecodeBinRecord(es(0))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es(0))),
    ("simhash_sig",
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (es: Seq[Expression]) => SimHashSig(es(0))),
    // Spark ships these two for its own runtime join filtering but does
    // not register them in the SQL FunctionRegistry; exposing them makes
    // the map-side bloom prefilter (decontamination_bloom) expressible
    // as a scalar subquery — no driver-side filter build, no collect.
    ("graft_bloom_agg",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (es: Seq[Expression]) => es match {
        case Seq(child) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child)
        case Seq(child, items) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child, items)
        case Seq(child, items, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child, items, bits)
        case _ => throw new IllegalArgumentException(
          s"graft_bloom_agg expects 1-3 arguments, got ${es.size}")
      }),
    ("topk_structs",
      new ExpressionInfo(classOf[TopKStructs].getName, "topk_structs"),
      (es: Seq[Expression]) => TopKStructs(es(0), es(1))),
    ("mg_topfreq",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "mg_topfreq"),
      (es: Seq[Expression]) => MisraGriesAgg(es(0), es(1))),
    ("graft_might_contain",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
