package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Seasonality — exact weekday baselines and deviations, ISO dow. */
class SeasonalitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 10:00:00")

  test("weekday baseline pairs and deviations match hand math; ISO " +
    "numbering (2024-01-01 is a Monday); single-date weekday is its " +
    "own baseline") {
    // Mondays: Jan 1 (4 events), Jan 8 (2) -> total 6 over 2 days
    // Tuesday: Jan 2 (3) -> sole observation
    val events = (Seq.fill(4)(ts("2024-01-01")) ++
      Seq.fill(2)(ts("2024-01-08")) ++ Seq.fill(3)(ts("2024-01-02")))
      .toDF("ts")
    val got = Seasonality.dowDeviation(events, "ts")
      .orderBy("day")
      .as[(java.sql.Date, Int, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 1, 4L, 6L, 2L, 1333L),
      (java.sql.Date.valueOf("2024-01-02"), 2, 3L, 3L, 1L, 1000L),
      (java.sql.Date.valueOf("2024-01-08"), 1, 2L, 6L, 2L, 666L)))
    // a Sunday lands on ISO 7
    val sun = Seasonality.dowDeviation(
      Seq(ts("2024-01-07")).toDF("ts"), "ts")
      .select("dow_iso").as[Int].head()
    assert(sun == 7)
  }
}
