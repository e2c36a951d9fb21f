package graft.operators

import graft.Tables
import graft.functions.VectorExprs.{vecDistSq, vecDot, vecNorm}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over `embeddings` (64-dim float vectors):
  * cosine near-dup pairs, brute-force ANN (the exactness baseline),
  * LSH-bucketed ANN (the scale path), and nearest-centroid
  * classification.
  *
  * Determinism contract with the DuckDB oracle: every dot product /
  * norm is a LEFT-TO-RIGHT sequential fold over doubles
  * (`aggregate(zip_with(...))` in Spark ≡ `list_reduce(list_zip(...))`
  * in DuckDB), so cosines are bit-identical and no rounding is needed
  * anywhere — thresholds and orderings agree exactly.
  */
object VectorOps {

  /** Sequential-fold kernels as custom codegen'd expressions (see
    * graft.functions.VecOps for why neither higher-order functions nor
    * unrolled chains survive at scale). */
  private def dot(a: Column, b: Column): Column = vecDot(a, b)

  /** embedding (as float array) plus its precomputed norm. */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .withColumn("vd", col("embedding"))
      .withColumn("norm", vecNorm(col("embedding")))

  private val dotSqlA = // DuckDB twin of dot(): sequential fold
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      "list_transform(list_zip(%s, %s), s -> s[1]*s[2])), (acc, x) -> acc + x)"

  val nearDupThreshold = 0.4

  /** Embedding near-dup pairs: all-pairs cosine ≥ threshold.
    * Exact by design (it is the oracle baseline for [[annLsh]]); at
    * 100 TB you run [[annLsh]]'s bucketing first and this verify-join
    * only on candidates — same shape as MinHash vs exact Jaccard. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val a = v.select(col("vec_id").as("vec_id_a"), col("vd").as("va"), col("norm").as("norm_a"))
    val b = v.select(col("vec_id").as("vec_id_b"), col("vd").as("vb"), col("norm").as("norm_b"))
    a.join(b, col("vec_id_a") < col("vec_id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("norm_a") * col("norm_b")))
      .filter(col("cos") >= nearDupThreshold)
      .select("vec_id_a", "vec_id_b", "cos")
  }

  val embeddingNearDupSql: String = {
    val dotAB = dotSqlA.format("a.vd", "b.vd")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, vd,
       |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(vd, x -> x*x)), (acc, x) -> acc + x)) AS norm
       |  FROM v)
       |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       |  $dotAB/(a.norm*b.norm) AS cos
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE $dotAB/(a.norm*b.norm) >= $nearDupThreshold""".stripMargin
  }

  val nQueries = 10
  val topK = 5

  /** Brute-force cosine top-k: queries are vec_id < nQueries, corpus is
    * the rest. The exact baseline every ANN variant is judged against. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vd").as("qv"), col("norm").as("qn"))
    val c = v.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("vd").as("cv"), col("norm").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.crossJoin(c)
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  val annBruteForceSql: String = {
    val dotAB = dotSqlA.format("q.vd", "c.vd")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, vd,
       |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(vd, x -> x*x)), (acc, x) -> acc + x)) AS norm
       |  FROM v),
       |q AS (SELECT vec_id AS query_id, vd, norm FROM n WHERE vec_id < $nQueries),
       |c AS (SELECT vec_id AS neighbor_id, vd, norm FROM n WHERE vec_id >= $nQueries),
       |s AS (
       |  SELECT q.query_id, c.neighbor_id,
       |   $dotAB/(q.norm*c.norm) AS cos
       |  FROM (SELECT query_id, vd, norm FROM q) q, (SELECT neighbor_id, vd, norm FROM c) c),
       |r AS (
       |  SELECT query_id, neighbor_id, cos,
       |   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM s)
       |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= $topK""".stripMargin
  }

  /** Random-hyperplane LSH ANN — the 100 TB path: 8 seeded hyperplanes
    * → 256 buckets; search only the query's bucket, exact re-rank
    * inside. Recall < 1 by construction → rows-only check here; the
    * ScalaTest spec asserts recall ≥ 0.5 vs [[annBruteForce]]. */
  val numPlanes = 8

  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numPlanes)(Seq.fill(64)(rnd.nextGaussian()))
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val planeCols = planes.map(p => typedlit(p))
    val bucket = planeCols.zipWithIndex.map { case (p, i) =>
      when(dot(col("vd"), p) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val bucketed = v.withColumn("bucket", bucket)
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vd").as("qv"), col("norm").as("qn"), col("bucket"))
    val c = bucketed.filter(col("vec_id") >= nQueries)
      .select(col("vec_id").as("neighbor_id"), col("vd").as("cv"), col("norm").as("cn"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(c, Seq("bucket"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** IVF ANN — the other 100 TB path besides LSH: a coarse quantizer
    * (k centroids from 2 Lloyd iterations, deterministically seeded
    * with the lowest corpus ids), inverted lists keyed by nearest
    * centroid, and nprobe-list exact search per query. At scale the
    * inverted lists are the shuffle partitioning: each query touches
    * nprobe/k of the corpus. Recall < 1 by construction → rows-only
    * check + recall spec. */
  val ivfK = 16
  val ivfProbes = 4

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val corpus = v.filter(col("vec_id") >= nQueries)
      .select(col("vec_id"), col("vd"), col("norm"))

    // deterministic seed: the k lowest-id corpus vectors
    var cents: DataFrame = corpus.orderBy(col("vec_id")).limit(ivfK)
      .select(col("vec_id"), transform(col("vd"), x => x.cast("double")).as("cv"))
      .withColumn("cid", row_number().over(Window.orderBy(col("vec_id"))) - 1)
      .select("cid", "cv")

    def assign(points: DataFrame, cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)
      points.crossJoin(broadcast(cents))
        .withColumn("d2", vecDistSq(col("vd"), col("cv")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cid"), col("vd"))
    }

    // 2 Lloyd iterations (sorted-fold means → deterministic)
    for (_ <- 1 to 2) {
      val assigned = assign(corpus, cents)
      val e = assigned.select(col("cid"), posexplode(col("vd")).as(Seq("dim", "x")))
        .withColumn("x", col("x").cast("double"))
      cents = e.groupBy("cid", "dim")
        .agg((aggregate(array_sort(collect_list(col("x"))), lit(0.0), (a, x) => a + x)
              / count(lit(1))).as("cx"))
        .groupBy("cid")
        .agg(collect_list(struct(col("dim"), col("cx"))).as("pairs"))
        .select(col("cid"), transform(array_sort(col("pairs")), p => p.getField("cx")).as("cv"))
    }

    val invlist = assign(corpus, cents).select(col("vec_id").as("neighbor_id"), col("cid"))

    // queries probe their nprobe nearest centroids
    val q = v.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vd").as("qv"), col("norm").as("qn"))
    val wp = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cid").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("d2", vecDistSq(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= ivfProbes)
      .select("query_id", "qv", "qn", "cid")

    val c = corpus.select(col("vec_id").as("neighbor_id"), col("vd").as("cv2"), col("norm").as("cn"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    probes.join(invlist, Seq("cid"))
      .join(c, Seq("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv2")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Nearest-centroid classification: per-label centroids (sorted
    * sequential fold → order-independent exact mean), broadcast to
    * every vector, argmin distance with label tie-break. */
  def knnCentroid(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val e = v.select(col("vec_id"), col("label"), posexplode(col("vd")).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
    val cdim = e.groupBy("label", "dim")
      .agg((aggregate(array_sort(collect_list(col("x"))), lit(0.0), (a, x) => a + x)
            / count(lit(1))).as("cx"))
    val cent = cdim.groupBy("label")
      .agg(collect_list(struct(col("dim"), col("cx"))).as("pairs"))
      .select(col("label").as("clabel"),
        transform(array_sort(col("pairs")), p => p.getField("cx")).as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2").asc, col("clabel").asc)
    v.select(col("vec_id"), col("label"), col("vd"))
      .crossJoin(broadcast(cent))
      .withColumn("dist2", vecDistSq(col("vd"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("clabel").as("pred_label"),
        (col("label") === col("clabel")).as("correct"))
  }

  val knnCentroidSql: String =
    """WITH v AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
      |  FROM embeddings),
      |e AS (
      |  SELECT vec_id, label, generate_subscripts(vd, 1) AS dim, unnest(vd) AS x
      |  FROM v),
      |c AS (
      |  SELECT label, dim,
      |   list_reduce(list_prepend(CAST(0 AS DOUBLE), list(x ORDER BY x)),
      |               (a, b) -> a + b) / count(*) AS cx
      |  FROM e GROUP BY label, dim),
      |cent AS (SELECT label AS clabel, list(cx ORDER BY dim) AS cv FROM c GROUP BY label),
      |d AS (
      |  SELECT v.vec_id, v.label, cent.clabel,
      |   list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |     list_transform(list_zip(v.vd, cent.cv), s -> (s[1]-s[2])*(s[1]-s[2]))),
      |     (a, b) -> a + b) AS dist2
      |  FROM v, cent),
      |r AS (
      |  SELECT vec_id, label, clabel,
      |   row_number() OVER (PARTITION BY vec_id ORDER BY dist2, clabel) AS rk
      |  FROM d)
      |SELECT vec_id, label, clabel AS pred_label, (label = clabel) AS correct
      |FROM r WHERE rk = 1""".stripMargin
}
