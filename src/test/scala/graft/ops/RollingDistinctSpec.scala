package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** RollingDistinct — dedup-before-expand trailing distinct counts must
  * equal the brute-force per-window recount. */
class RollingDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")

  test("matches brute-force recount per emitted window; repeats within " +
    "a day count once; multi-day activity counts once in n_active but " +
    "per-day in n_id_days") {
    // id 1 active days 1,2,3 (twice on day 2); id 2 active day 2 only;
    // id 3 active days 1 and 10 (a gap larger than the window)
    val events = Seq(
      (1L, ts(1, 5)), (1L, ts(2, 1)), (1L, ts(2, 23)), (1L, ts(3)),
      (2L, ts(2, 12)), (3L, ts(1)), (3L, ts(10))
    ).toDF("user_id", "ts")
    val got = RollingDistinct.rollingActive(events, "ts", "user_id", 3, 1)
      .orderBy("window_start")
      .as[(Timestamp, Timestamp, Long, Long)].collect().toSeq
    val idDays = Seq(1L -> 1, 1L -> 2, 1L -> 3, 2L -> 2, 3L -> 1, 3L -> 10)
    // every (id, day) lands in exactly width/step = 3 windows
    val starts = idDays.flatMap { case (_, d) => (d - 2 to d) }.distinct
    assert(got.map(_._1).toSet ==
      starts.map(d => Timestamp.valueOf(
        java.time.LocalDate.of(2023, 12, 31).plusDays(d)
          .atStartOfDay().toString.replace('T', ' ') + ":00")).toSet)
    got.foreach { case (ws, we, nActive, nIdDays) =>
      val lo = ws.toLocalDateTime.getDayOfMonth +
        (if (ws.toLocalDateTime.getMonthValue == 12) -31 else 0)
      val inWin = idDays.filter { case (_, d) => d >= lo && d < lo + 3 }
      assert(we.toLocalDateTime == ws.toLocalDateTime.plusDays(3))
      assert(nActive == inWin.map(_._1).distinct.size, s"n_active @ $ws")
      assert(nIdDays == inWin.size, s"n_id_days @ $ws")
    }
    // the day-2-only id never inflates disjoint windows: day-10 window
    // holds exactly id 3 once
    val w10 = got.find(_._1 == ts(10)).get
    assert(w10._3 == 1L && w10._4 == 1L)
  }

  test("null id and null ts rows are dropped; step must divide width") {
    val events = Seq(
      (Some(1L), Option(ts(1))), (None, Option(ts(1))),
      (Some(2L), Option.empty[Timestamp])
    ).toDF("user_id", "ts")
    val got = RollingDistinct.rollingActive(events, "ts", "user_id", 2, 1)
      .orderBy("window_start")
      .as[(Timestamp, Timestamp, Long, Long)].collect().toSeq
    assert(got.map(_._3).forall(_ == 1L) && got.size == 2)
    intercept[IllegalArgumentException] {
      RollingDistinct.rollingActive(events, "ts", "user_id", 7, 2)
    }
  }

  test("streaks: islands, longest-tie earliest start, last streak, " +
    "multiple same-day events count one day, nulls dropped") {
    // id 1: days 1-3 (streak 3), day 5 (streak 1), days 7-9 (streak 3,
    //   ties longest -> earliest start day 1 wins), twice on day 2
    // id 2: day 4 only
    val events = Seq(
      (Some(1L), Option(ts(1))), (Some(1L), Option(ts(2))),
      (Some(1L), Option(ts(2, 9))), (Some(1L), Option(ts(3))),
      (Some(1L), Option(ts(5))),
      (Some(1L), Option(ts(7))), (Some(1L), Option(ts(8))),
      (Some(1L), Option(ts(9))),
      (Some(2L), Option(ts(4))),
      (None, Option(ts(1))), (Some(3L), Option.empty[Timestamp])
    ).toDF("user_id", "ts")
    val got = RollingDistinct.streaks(events, "ts", "user_id")
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val day1 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    assert(got == Seq(
      (1L, 7L, 3L, 3L, day1, 3L, day1 + 8),
      (2L, 1L, 1L, 1L, day1 + 3, 1L, day1 + 3)))
  }

  test("dedup happens before the window expand: the first full-volume " +
    "stage is a partial-aggregate dedup, not the x(width/step) Expand") {
    val events = (0 until 1000).map(i => (i.toLong % 7, ts(1 + i % 5)))
      .toDF("user_id", "ts")
    val plan = RollingDistinct.rollingActive(events, "ts", "user_id", 7, 1)
      .queryExecution.executedPlan.toString
    // scan feeds a HashAggregate (the dedup) BEFORE any Expand node
    val iExpand = plan.indexOf("Expand")
    val iScan = plan.indexOf("LocalTableScan")
    assert(iExpand >= 0 && iScan > iExpand,
      "expected the Expand to sit above the dedup'd scan:\n" + plan)
    assert(plan.indexOf("HashAggregate", iExpand) > 0,
      "expected a dedup HashAggregate between scan and expand:\n" + plan)
  }
}
