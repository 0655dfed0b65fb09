package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Retention — cohort retention matrix. */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Week = 604800L
  // anchor on an exact week boundary (epoch micros div week = 2800)
  private val Base = 2800L * Week
  private def ts(week: Long, sec: Long = 0L) =
    new Timestamp((Base + week * Week + sec) * 1000L)

  private def matrix(rows: Seq[(Long, Timestamp)]): Map[(Long, Long), Long] =
    Retention.matrix(rows.toDF("user_id", "ts"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1 - 2800L, r._2) -> r._3).toMap

  test("cohort = week of first event; offsets count weeks active again; " +
    "multiple events in one week count once") {
    val got = matrix(Seq(
      // u1: cohort w0, active w0 (x2), w2
      (1L, ts(0)), (1L, ts(0, 30)), (1L, ts(2)),
      // u2: cohort w0, active w0 only
      (2L, ts(0, 60)),
      // u3: cohort w1, active w1 and w2
      (3L, ts(1)), (3L, ts(2, 5))
    ))
    assert(got == Map(
      (0L, 0L) -> 2L, // cohort w0 size 2
      (0L, 2L) -> 1L, // u1 back in w2
      (1L, 0L) -> 1L, // cohort w1 size 1
      (1L, 1L) -> 1L  // u3 back in w2 (offset 1)
    ))
  }

  test("week-boundary event lands in the NEXT week (integer div, no " +
    "float rounding)") {
    val got = matrix(Seq(
      (1L, ts(0, Week - 1)), // last second of w0
      (1L, ts(1))            // first second of w1
    ))
    assert(got == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L))
  }

  test("null users and null timestamps are dropped") {
    val df = Seq((Some(1L), Some(ts(0))), (None, Some(ts(0))),
      (Some(2L), Option.empty[Timestamp]))
      .toDF("user_id", "ts")
    val got = Retention.matrix(df).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2800L, 0L, 1L)))
  }

  test("one exchange on the user key: weekly dedup and the cohort " +
    "min-window share it; the final matrix agg is the only other") {
    // a range-based input, NOT a LocalRelation: ConvertToLocalRelation
    // folds a distinct on a local fixture at optimization time, which
    // made this assert pass vacuously (review-pass-11 follow-up)
    import org.apache.spark.sql.functions.{col, lit, pmod, timestamp_micros}
    val df = spark.range(100).toDF("event_id")
      .withColumn("user_id", pmod(col("event_id"), lit(7)))
      .withColumn("ts",
        timestamp_micros(lit(Base * 1000000L) + col("event_id")))
    val plan = Retention.matrix(df).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, // user shuffle + (cohort, offset) aggregate
      s"expected TWO hash exchanges, got $exchanges:\n${plan.take(3000)}")
  }
}
