package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** ChangePoint — Page's one-sided CUSUM drift detector. */
class ChangePointSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], drift: Long,
      threshold: Long) =
    ChangePoint.cusum(rows.toDF("key", "period", "value"), drift,
      threshold)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("excess over drift accumulates; dips reset toward zero, never " +
    "below") {
    val rows = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("a", 3L, 2L),
      ("a", 4L, 0L), ("a", 5L, 12L))
    // drift 5: S = 0, 4, 1, 0 (floored), 7
    assert(run(rows, drift = 5, threshold = 6) == Seq(
      ("a", 1L, 5L, 0L, false), ("a", 2L, 9L, 4L, false),
      ("a", 3L, 2L, 1L, false), ("a", 4L, 0L, 0L, false),
      ("a", 5L, 12L, 7L, true)))
  }

  test("a slow drift no single period would flag accumulates to an " +
    "alarm") {
    val rows = (1L to 10L).map(p => ("k", p, 7L)) // +2/period vs drift 5
    val got = run(rows, drift = 5, threshold = 11)
    assert(got.map(_._4) == (2L to 20L by 2L))
    assert(got.count(_._5) == 5) // periods 6..10: S = 12..20
  }

  test("keys are independent series; state never leaks across keys") {
    val rows = Seq(("a", 1L, 100L), ("b", 1L, 0L), ("a", 2L, 0L),
      ("b", 2L, 0L))
    val got = run(rows, drift = 1, threshold = 50)
    assert(got == Seq(
      ("a", 1L, 100L, 99L, true), ("a", 2L, 0L, 98L, true),
      ("b", 1L, 0L, 0L, false), ("b", 2L, 0L, 0L, false)))
  }

  test("NULL keys drop; NULL values count zero") {
    val rows = Seq((Some("a"), 1L, Some(10L)), (Some("a"), 2L, None),
      (None, 1L, Some(5L)))
    val got = ChangePoint.cusum(rows.toDF("key", "period", "value"),
      drift = 2, threshold = 100)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      .sortBy(_._2)
    assert(got == Seq(("a", 1L, 10L, 8L, false),
      ("a", 2L, 0L, 6L, false)))
  }

  test("one shuffle, streaming scan — no buffering aggregate") {
    val plan = ChangePoint.cusum(
      Seq(("a", 1L, 1L)).toDF("key", "period", "value"), 1, 5)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected one Exchange:\n${plan.take(3000)}")
    assert(!plan.contains("ObjectHashAggregate") &&
      !plan.contains("SortAggregate"), "scan must stream, not buffer")
  }
}
