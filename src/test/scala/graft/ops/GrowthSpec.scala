package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Growth — new vs returning entities per integer period. */
class GrowthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Day = 86400L

  // (user_id, day, secondInDay)
  private def growth(rows: (Long, Long, Long)*) =
    Growth.newVsReturning(
      rows.toSeq.map { case (u, d, s) => (u, d * Day + s) }
        .toDF("user_id", "sec")
        .selectExpr("user_id", "timestamp_seconds(sec) AS ts"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("new on first-ever day, returning afterwards; same-day repeats " +
    "count once; cumulative accumulates across gaps") {
    val got = growth(
      (1L, 0L, 10L), (1L, 0L, 20L), // u1 day0 twice -> active once, new
      (2L, 0L, 30L),                // u2 day0 new
      (1L, 1L, 0L),                 // u1 day1 returning
      (3L, 1L, 0L),                 // u3 day1 new
      (1L, 3L, 0L), (2L, 3L, 0L))   // both returning after a gap day
    assert(got == Map(
      0L -> ((2L, 2L, 0L, 2L)),
      1L -> ((2L, 1L, 1L, 3L)),
      3L -> ((2L, 0L, 2L, 3L))))
  }

  test("active = new + returning on every row; NULL users/ts dropped") {
    val df = Seq((Some(1L), Some(0L)), (None, Some(5L)),
      (Some(2L), None)).map { case (u, s) =>
      (u, s.map(x => new java.sql.Timestamp(x * 1000L)))
    }.toDF("user_id", "ts")
    val got = Growth.newVsReturning(df)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 1L, 1L, 0L, 1L)))
  }

  test("one corpus exchange: the dedup and the first-period window " +
    "share the entity repartition (tiny per-period tail excluded)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).toDF("event_id")
      .withColumn("user_id", pmod(col("event_id"), lit(29)))
      .withColumn("ts", timestamp_seconds(col("event_id") * 3601))
    val plan = Growth.newVsReturning(df)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // entity repartition + per-period aggregate; the cumulative window's
    // singlepartition exchange is not hashpartitioning
    assert(exchanges == 2,
      s"expected TWO hash exchanges, got $exchanges:\n${plan.take(3000)}")
  }
}
