package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** RiskScore — conversation escalation rollup. */
class RiskScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def risk(rows: Seq[(String, String, String)]) =
    RiskScore.conversationRisk(
      rows.toDF("conv_id", "value", "threat_level"))
      .select("conv_id", "n_matches", "n_indicators", "risk_score",
        "tier")
      .as[(String, Long, Long, Long, String)]
      .collect().toSeq.sortBy(_._1)

  test("weights fold per level; tiers come from the integer thresholds") {
    val rows = Seq(
      // a: 100 + 50 + 50 = 200 -> review (inclusive bound)
      ("a", "1.2.3.4", "critical"), ("a", "x.com", "high"),
      ("a", "x.com", "high"),
      // b: 5 -> routine
      ("b", "y.com", "low"),
      // c: 10 x critical = 1000 -> escalate (inclusive bound)
      ("c", "z.com", "critical"), ("c", "z.com", "critical"),
      ("c", "z.com", "critical"), ("c", "z.com", "critical"),
      ("c", "z.com", "critical"), ("c", "z.com", "critical"),
      ("c", "z.com", "critical"), ("c", "z.com", "critical"),
      ("c", "z.com", "critical"), ("c", "z.com", "critical"))
    assert(risk(rows) == Seq(
      ("a", 3L, 2L, 200L, "review"),
      ("b", 1L, 1L, 5L, "routine"),
      ("c", 10L, 1L, 1000L, "escalate")))
  }

  test("unknown and NULL threat levels take defaultWeight, never 0") {
    val rows = Seq(("d", "v1", "weird-new-level"), ("d", "v2", null))
    assert(risk(rows) == Seq(("d", 2L, 2L, 2L, "routine")))
  }

  test("n_indicators is distinct values; n_matches is rows") {
    val rows = Seq(("e", "same.com", "low"), ("e", "same.com", "low"),
      ("e", "same.com", "low"))
    assert(risk(rows) == Seq(("e", 3L, 1L, 15L, "routine")))
  }

  test("custom weights and thresholds") {
    val got = RiskScore.conversationRisk(
      Seq(("f", "v", "critical")).toDF("conv_id", "value",
        "threat_level"),
      weights = Seq("critical" -> 7), defaultWeight = 0,
      escalateAt = 7L, elevatedAt = 7L)
      .select("risk_score", "tier").as[(Long, String)].collect().toSeq
    assert(got == Seq((7L, "escalate")))
  }

  test("the rollup shuffles on conv_id only (the routed-sink key)") {
    val plan = RiskScore.conversationRisk(
      Seq(("a", "v", "low")).toDF("conv_id", "value", "threat_level"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning\\(([a-z_]+)"
      .r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(shuffles.subsetOf(Set("conv_id")),
      s"unexpected shuffle keys $shuffles:\n" + plan.take(2000))
  }

  test("parameter validation") {
    val df = Seq(("a", "v", "low")).toDF("conv_id", "value",
      "threat_level")
    intercept[IllegalArgumentException] {
      RiskScore.conversationRisk(df, weights = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      RiskScore.conversationRisk(df, escalateAt = 10L, elevatedAt = 20L)
    }
  }
}
