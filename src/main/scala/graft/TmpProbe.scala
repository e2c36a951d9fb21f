package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Texts._
object TmpProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"PROBE $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables(spark, dir, "documents")
    t("warmup")(docs.count())
    val ex = docs.select(col("doc_id"), explode(array_distinct(shingles3(tokens(col("text"))))).as("s"))
    t("explode shingles")(ex.count())
    val keep = ex.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= 100)
    t("df filter")(keep.count())
    val ex2 = ex.join(keep, "s")
    t("capped join")(ex2.count())
    val sigCols = (0 until 128).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val sigs = ex2.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    t("minhash sigs")(sigs.count())
    val sets = ex2.groupBy("doc_id").agg(collect_list(col("s")).as("shs"), count(lit(1)).as("n"))
    t("collect sets")(sets.count())
    val sorted = ex2.groupBy("doc_id").agg(sort_array(collect_list(struct(col("df"), col("s")))).as("arr"), count(lit(1)).as("n"))
    val withPrefix = sorted.withColumn("p", col("n") - floor((col("n")*4+4)/5) + 1)
      .select(col("doc_id"), explode(transform(slice(col("arr"), lit(1), col("p").cast("int")), e => e.getField("s"))).as("s"))
    t("prefix index")(withPrefix.count())
    val a = withPrefix.withColumnRenamed("doc_id","doc_a"); val b = withPrefix.withColumnRenamed("doc_id","doc_b")
    val cands = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b")).select("doc_a","doc_b").distinct()
    t("prefix cands")(System.err.println("cands=" + cands.count()))
    t("full ngram")(operators.DedupOps.ngramJaccard(spark, dir).count())
    t("full minhash")(operators.DedupOps.minhashLsh(spark, dir).count())
    t("full simhash")(operators.DedupOps.simhash(spark, dir).count())
    spark.stop()
  }
}
