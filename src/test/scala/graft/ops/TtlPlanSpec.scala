package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TtlPlan — verdicts and accounting vs a literal replay; NULL ts is
  * live, never expired. */
class TtlPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("drop / rewrite / keep classification with exact accounting") {
    val cutoff = ts("2024-06-01 00:00:00")
    val rows = Seq(
      // bucket 0: all expired -> drop
      (0L, Option(ts("2024-01-01 00:00:00"))),
      (0L, Option(ts("2024-02-01 00:00:00"))),
      // bucket 1: mixed -> rewrite (1 live incl. the null-ts row)
      (1L, Option(ts("2024-01-01 00:00:00"))),
      (1L, Option(ts("2024-07-01 00:00:00"))),
      (1L, Option.empty[Timestamp]),
      // bucket 2: all live -> keep
      (2L, Option(ts("2024-07-02 00:00:00"))),
      // bucket 3: only null ts -> keep (expiry unprovable)
      (3L, Option.empty[Timestamp])
    ).toDF("b", "ts")
    val got = TtlPlan.retentionPlan(rows, col("b"), "ts", lit(cutoff))
      .orderBy("verdict")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("drop", 1L, 2L, 2L, 0L, 0L),
      ("keep", 2L, 2L, 0L, 2L, 1L),
      ("rewrite", 1L, 3L, 1L, 2L, 1L)))
  }

  test("a time-clustered layout converts rewrite buckets to drops " +
    "(the maintenance dividend of sorting by ts)") {
    val cutoff = ts("2024-01-11 00:00:00")
    val rows = (0 until 200).map { i =>
      val day = (i % 20).toLong // cycling: every id-bucket mixes all days
      (i.toLong, day,
        new Timestamp(1704067200000L + day * 86400000L))
    }.toDF("id", "day", "ts")
    val scattered = TtlPlan.retentionPlan(rows, expr("id div 20"),
      "ts", lit(cutoff)).orderBy("verdict")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val clustered = TtlPlan.retentionPlan(rows, expr("day div 2"),
      "ts", lit(cutoff)).orderBy("verdict")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // insertion order: every bucket mixes days -> all rewrite
    assert(scattered.map(_._1) == Seq("rewrite"))
    // day-clustered: no rewrite at an even-day cutoff — only drop/keep
    assert(clustered.map(_._1) == Seq("drop", "keep"))
    // identical totals either way: the plan never changes the data
    assert(scattered.map(r => r._3 + 0).sum ==
      clustered.map(_._3).sum)
    assert(scattered.map(_._4).sum == clustered.map(_._4).sum)
  }
}
