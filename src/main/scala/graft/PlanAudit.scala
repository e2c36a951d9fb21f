package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-health report over every library query: shuffle and broadcast
  * counts plus forbidden-pattern flags (cartesian products, corpus
  * nested loops). The per-query shuffle count is the number to watch
  * when reviewing a change for 100 TB readiness — a new Exchange in a
  * hot query is a regression even when results still match.
  *
  * Usage: `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val node = """\(\d+\) (\w+)""".r
    println(f"${"query"}%-24s shuffles broadcasts flags")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val nodes = node.findAllMatchIn(p).map(_.group(1)).toSeq
        val shuffles = nodes.count(_ == "Exchange")
        val bcasts = nodes.count(_ == "BroadcastExchange")
        val flags = Seq(
          Option.when(nodes.contains("CartesianProduct"))("CARTESIAN"),
          Option.when(nodes.contains("BroadcastNestedLoopJoin"))("BNLJ"))
          .flatten.mkString(",")
        println(f"$name%-24s $shuffles%8d $bcasts%10d $flags")
      } catch {
        case e: Throwable => println(f"$name%-24s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
