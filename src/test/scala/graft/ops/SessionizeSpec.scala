package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Sessionize — gap-based batch sessionization. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("boundaries: first event, strict > gap; equal timestamps never " +
    "split; per-user isolation") {
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(600), 2.0),      // session 1
      (1L, ts(600 + 3600), 3.0),                 // gap EXACTLY 3600 -> same
      (1L, ts(600 + 3600 + 3601), 4.0),          // 3601 > 3600 -> session 2
      (1L, ts(600 + 3600 + 3601), 5.0),          // equal ts -> same session
      (2L, ts(50), 6.0)                          // another user: session 1
    ).toDF("user_id", "ts", "value")
    val got = Sessionize.assign(events, gapSeconds = 3600)
      .select("user_id", "ts", "session_idx")
      .as[(Long, Timestamp, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.getTime).map(_._3).toSeq).toMap
    assert(got(1L) == Seq(1L, 1L, 1L, 2L, 2L), got.toString)
    assert(got(2L) == Seq(1L))
  }

  test("stats: per-session rollup with integer-cents extra aggregate") {
    val events = Seq(
      (1L, ts(0), 1.25), (1L, ts(10), 2.25),
      (1L, ts(10000), 10.0)
    ).toDF("user_id", "ts", "value")
    val got = Sessionize.stats(events, gapSeconds = 3600,
      extraAggs = Seq(
        sum(round(col("value") * 100, 0).cast("bigint")).as("cents")))
      .as[(Long, Long, Long, Timestamp, Timestamp, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 1L, 2L, ts(0), ts(10), 350L),
      (1L, 2L, 1L, ts(10000), ts(10000), 1000L)), got.toString)
  }

  test("one shuffle: the session rollup reuses the window's user " +
    "partitioning (no second exchange above it)") {
    val events = Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "value")
    val plan = Sessionize.stats(events, gapSeconds = 60)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected ONE hash exchange, got $exchanges:\n" +
      plan.take(2000))
  }

  test("gapSeconds must be positive") {
    intercept[IllegalArgumentException] {
      Sessionize.assign(Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "value"),
        gapSeconds = 0)
    }
  }
}
