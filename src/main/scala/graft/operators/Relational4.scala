package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth relational tranche: the remaining plan families — full
  * outer reconciliation, set operations, pivot — each one shuffle
  * beyond its inputs and oracle-checked.
  */
object Relational4 {

  /** Full-outer reconciliation: per-nation counts of high-balance
    * customers vs high-balance suppliers; either side may be absent
    * (that's what full outer is for) → coalesced zeros + a status
    * column. Both inputs are pre-aggregated, so the join carries one
    * row per nation, not raw entities. */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
    val s = Tables(spark, dir, "supplier").filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("ck") === col("sk"), "full_outer")
      .select(
        coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        when(col("ck").isNull, "supp_only")
          .when(col("sk").isNull, "cust_only")
          .otherwise("both").as("presence"))
  }

  val qFullOuterSql: String =
    """WITH c AS (
      | SELECT c_nationkey AS ck, count(*) AS n_cust
      | FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
      |s AS (
      | SELECT s_nationkey AS sk, count(*) AS n_supp
      | FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
      |SELECT coalesce(ck, sk) AS nationkey,
      | coalesce(n_cust, 0) AS n_cust,
      | coalesce(n_supp, 0) AS n_supp,
      | CASE WHEN ck IS NULL THEN 'supp_only'
      |      WHEN sk IS NULL THEN 'cust_only'
      |      ELSE 'both' END AS presence
      |FROM c FULL OUTER JOIN s ON ck = sk""".stripMargin

  /** Set operations within one hour of activity: users who clicked
    * AND purchased but hit no error — INTERSECT then EXCEPT (both
    * distinct-semantics, each a single hash-based shuffle). */
  val setOpsHour = 3

  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    def users(t: String) = Tables(spark, dir, "events")
      .filter(col("event_type") === t && hour(col("ts")) === setOpsHour)
      .select("user_id")
    users("click").intersect(users("purchase")).except(users("error"))
  }

  val qSetOpsSql: String =
    s"""SELECT user_id FROM (
       | SELECT user_id FROM events WHERE event_type = 'click' AND hour(ts) = $setOpsHour
       | INTERSECT
       | SELECT user_id FROM events WHERE event_type = 'purchase' AND hour(ts) = $setOpsHour)
       |EXCEPT
       |SELECT user_id FROM events WHERE event_type = 'error' AND hour(ts) = $setOpsHour""".stripMargin

  /** CUBE grouping sets: counts at every (event_type × hour-of-day)
    * aggregation level in one pass, tagged with grouping_id so
    * consumers can tell subtotal rows apart — the OLAP rollup family
    * beyond the plain ROLLUP already covered. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .cube(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))

  val qCubeSql: String =
    """SELECT event_type, CAST(hour(ts) AS INT) AS hod, count(*) AS n,
      | CAST(GROUPING(event_type) * 2 + GROUPING(hour(ts)) AS BIGINT) AS gid
      |FROM events
      |GROUP BY CUBE (event_type, hour(ts))""".stripMargin

  /** Pivot: events per hour-of-day × event-type matrix. The pivot
    * column list is explicit (dynamic pivot needs a driver-side
    * distinct — an anti-pattern at scale). */
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "events")
      .groupBy(hour(col("ts")).as("hod"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    base.select(col("hod") +:
      eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  val qPivotSql: String = {
    val cols = eventTypes.map(t =>
      s"CAST(count(CASE WHEN event_type = '$t' THEN 1 END) AS BIGINT) AS \"$t\"")
      .mkString(",\n ")
    s"""SELECT CAST(hour(ts) AS INT) AS hod,
       | $cols
       |FROM events GROUP BY 1""".stripMargin
  }
}
