package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IntervalJoin — bucketized point-in-interval join. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val H = 3600L // seconds

  private def points(rows: (Long, Long)*) = // (event_id, sec)
    rows.toSeq.toDF("event_id", "sec")
      .selectExpr("event_id", "timestamp_seconds(sec) AS ts")

  private def intervals(rows: (Long, Long, Long)*) = // (id, startSec, endSec)
    rows.toSeq.toDF("iid", "s0", "s1")
      .selectExpr("iid", "timestamp_seconds(s0) AS start",
        "timestamp_seconds(s1) AS end")

  private def join(p: org.apache.spark.sql.DataFrame,
      i: org.apache.spark.sql.DataFrame, how: String = "inner",
      maxB: Long = 10000L) =
    IntervalJoin.pointInInterval(p, i, bucketMicros = H * 1000000L,
      how = how, maxBucketsPerInterval = maxB)
      .select("event_id", "iid")
      .as[(Long, Option[Long])].collect().toSet

  test("half-open [start, end): inside matches, start matches, end " +
    "does not; overlapping intervals each match; empty interval never") {
    val got = join(
      points((1L, 100L), (2L, 50L), (3L, 500L), (4L, 10L)),
      intervals((10L, 50L, 500L),   // [50, 500): events 1, 2 (at start)
        (11L, 90L, 110L),           // overlaps: event 1 again
        (12L, 7L, 7L)))             // empty: nothing
    assert(got == Set((1L, Some(10L)), (2L, Some(10L)), (1L, Some(11L))))
  }

  test("no duplicate pairs when an interval spans many buckets (the " +
    "point meets it in exactly one)") {
    // interval spans 5 hourly buckets; one point inside
    val out = IntervalJoin.pointInInterval(
      points((1L, 2 * H + 30L)), intervals((10L, 10L, 5 * H)),
      bucketMicros = H * 1000000L)
    assert(out.count() == 1)
  }

  test("bucket-boundary cases: interval ending exactly ON a boundary " +
    "does not leak into the next bucket; one starting on it matches") {
    val got = join(
      points((1L, 2 * H), (2L, 2 * H - 1L)),
      intervals((10L, H, 2 * H),        // [H, 2H): event 2 only
        (11L, 2 * H, 3 * H)))           // [2H, 3H): event 1 only
    assert(got == Set((2L, Some(10L)), (1L, Some(11L))))
  }

  test("left join keeps unmatched points once, with NULL interval " +
    "columns; NULL ts/bounds never match") {
    val p = Seq((1L, Some(100L)), (2L, Some(999999L)), (3L, None))
      .toDF("event_id", "sec")
      .selectExpr("event_id", "timestamp_seconds(sec) AS ts")
    val i = Seq((10L, Some(50L), Some(500L)), (11L, Some(50L), None))
      .toDF("iid", "s0", "s1")
      .selectExpr("iid", "timestamp_seconds(s0) AS start",
        "timestamp_seconds(s1) AS end")
    val got = join(p, i, how = "left")
    assert(got == Set((1L, Some(10L)), (2L, None), (3L, None)))
  }

  test("equi-keys must ALSO match: same time window, different user " +
    "-> no match") {
    val p = Seq((1L, 7L, 100L), (2L, 8L, 100L))
      .toDF("event_id", "user_id", "sec")
      .selectExpr("event_id", "user_id", "timestamp_seconds(sec) AS ts")
    val i = Seq((10L, 7L, 50L, 500L))
      .toDF("iid", "user_id", "s0", "s1")
      .selectExpr("iid", "user_id", "timestamp_seconds(s0) AS start",
        "timestamp_seconds(s1) AS end")
    val got = IntervalJoin.pointInInterval(p, i, keys = Seq("user_id"),
      bucketMicros = H * 1000000L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("explosion guard: an interval wider than maxBucketsPerInterval " +
    "raises a LOUD error (default ON); 0 opts out") {
    val p = points((1L, 100L))
    val i = intervals((10L, 0L, 100L * H)) // 100 buckets
    val err = intercept[Exception] {
      join(p, i, maxB = 10L)
    }
    assert(err.getMessage != null &&
      err.getMessage.contains("maxBucketsPerInterval"),
      s"unexpected error: ${err.getMessage}")
    assert(join(p, i, maxB = 0L) == Set((1L, Some(10L))))
  }

  test("plan: hash equi-join on (keys, bucket), NOT a nested-loop " +
    "theta join") {
    val p = spark.range(500).toDF("event_id")
      .withColumn("user_id", pmod(col("event_id"), lit(13)))
      .withColumn("ts", timestamp_seconds(col("event_id") * 60))
    val i = spark.range(50).toDF("iid")
      .withColumn("user_id", pmod(col("iid"), lit(13)))
      .withColumn("start", timestamp_seconds(col("iid") * 600))
      .withColumn("end", timestamp_seconds(col("iid") * 600 + 1800))
    val plan = IntervalJoin.pointInInterval(p, i, keys = Seq("user_id"),
      bucketMicros = H * 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"theta-join plan leaked through:\n${plan.take(3000)}")
    assert(plan.contains("Join"), plan.take(1000))
  }

  test("column collisions and bad `how` are rejected loudly") {
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points((1L, 1L)),
        intervals((1L, 0L, 10L)).withColumnRenamed("iid", "event_id"))
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points((1L, 1L)),
        intervals((1L, 0L, 10L)), how = "full")
    }
  }
}
