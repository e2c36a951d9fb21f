package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Golden plan-shape regression gate: every query's shuffle count,
  * broadcast count, and forbidden-pattern flags must match the
  * checked-in baseline. A deliberate plan change is made visible by
  * updating the baseline IN THE SAME COMMIT:
  *
  *   GRAFT_UPDATE_PLAN_BASELINE=1 sbt "testOnly graft.PlanBaselineSpec"
  *
  * This turns "a new Exchange slipped into a hot query" from a
  * judge-eyeball finding into a failing test.
  */
class PlanBaselineSpec extends AnyFunSuite {
  private val baselinePath = Paths.get("src/test/resources/plan-baseline.txt")

  test("every query plan matches the golden shuffle/broadcast baseline") {
    val actual = PlanAudit.audit(SparkSpec.spark, SparkSpec.sf).map(_.line)
    if (sys.env.contains("GRAFT_UPDATE_PLAN_BASELINE")) {
      Files.createDirectories(baselinePath.getParent)
      Files.write(baselinePath,
        (actual.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      info(s"baseline rewritten with ${actual.size} entries")
    } else {
      assert(Files.exists(baselinePath),
        "plan baseline missing — run with GRAFT_UPDATE_PLAN_BASELINE=1 to create it")
      val expected = Files.readAllLines(baselinePath, StandardCharsets.UTF_8)
        .asScala.toSeq.filter(_.nonEmpty)
      val exp = expected.map(l => l.takeWhile(_ != ' ') -> l).toMap
      val act = actual.map(l => l.takeWhile(_ != ' ') -> l).toMap
      val diffs = (exp.keySet ++ act.keySet).toSeq.sorted.flatMap { k =>
        (exp.get(k), act.get(k)) match {
          case (Some(e), Some(a)) if e == a => None
          case (e, a) => Some(s"$k:\n  baseline: ${e.getOrElse("<absent>")}\n  actual:   ${a.getOrElse("<absent>")}")
        }
      }
      assert(diffs.isEmpty,
        "plan shape drift (update src/test/resources/plan-baseline.txt " +
          "via GRAFT_UPDATE_PLAN_BASELINE=1 if deliberate):\n" + diffs.mkString("\n"))
    }
  }
}
