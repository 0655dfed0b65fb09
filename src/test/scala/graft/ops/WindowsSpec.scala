package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Windows — sliding-window rollups. */
class WindowsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // epoch-aligned base (1970-01-02 00:00:00 UTC) so expected window
  // starts are easy to reason about
  private val Day = 86400L
  private def ts(sec: Long) = new Timestamp((Day + sec) * 1000L)

  test("each event lands in exactly width/slide windows; counts and " +
    "integer sums per (window, key) are exact") {
    val events = Seq(
      (ts(0), "a", 100L),    // windows starting -45,-30,-15,0 min
      (ts(900), "a", 10L),   // windows starting -30,-15,0,15 min
      (ts(3600), "b", 1L)    // windows starting 15,30,45,60 min
    ).toDF("ts", "k", "v")
    val got = Windows.slidingAgg(events, widthSeconds = 3600,
      slideSeconds = 900, tsCol = "ts", keyCols = Seq("k"),
      aggs = Seq(count(lit(1)).as("n"), sum("v").as("s")))
      .select("window_start", "k", "n", "s")
      .as[(Timestamp, String, Long, Long)].collect().toSeq
      .sortBy(r => (r._2, r._1.getTime))
    // event at t=0 covers starts -2700..0 step 900; t=900 covers -1800..900
    val a = got.filter(_._2 == "a")
    assert(a.map(_._1).distinct.size == 5) // union of starts -2700..900
    assert(a.filter(r => Seq(-1800L, -900L, 0L).map(ts).contains(r._1))
      .forall(r => r._3 == 2 && r._4 == 110L)) // overlap of both events
    assert(a.count(_._3 == 1) == 2) // -2700 (first only) and 900 (second only)
    val b = got.filter(_._2 == "b")
    assert(b.map(_._1) == Seq(900L, 1800L, 2700L, 3600L).map(ts))
    assert(b.forall(r => r._3 == 1 && r._4 == 1L))
  }

  test("width=slide degenerates to the tumbling rollup") {
    val events = Seq((ts(0), 1L), (ts(59), 2L), (ts(60), 3L))
      .toDF("ts", "v")
    val got = Windows.slidingAgg(events, 60, 60, "ts", Nil,
      Seq(sum("v").as("s")))
      .select("window_start", "s").as[(Timestamp, Long)]
      .collect().toSeq.sortBy(_._1.getTime)
    assert(got == Seq((ts(0), 3L), (ts(60), 3L)))
  }

  test("exactly one shuffle (map-side expand + partial agg before it)") {
    val events = Seq((ts(0), "a", 1L)).toDF("ts", "k", "v")
    val plan = Windows.slidingAgg(events, 3600, 900, "ts", Seq("k"),
      Seq(count(lit(1)).as("n"))).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, plan.take(2000))
    assert(plan.contains("Expand"), "expected the map-side window Expand")
  }

  test("non-divisor slide and non-positive durations are rejected") {
    val events = Seq((ts(0), 1L)).toDF("ts", "v")
    intercept[IllegalArgumentException](
      Windows.slidingAgg(events, 3600, 700, "ts", Nil,
        Seq(count(lit(1)).as("n"))))
    intercept[IllegalArgumentException](
      Windows.slidingAgg(events, 0, 900, "ts", Nil,
        Seq(count(lit(1)).as("n"))))
    intercept[IllegalArgumentException](
      Windows.slidingAgg(events, 3600, 900, "ts", Nil, Nil))
  }

  test("throttleAudit: first-K-per-window admission replay matches a " +
    "literal recount; ties admitted by event id; null ts dropped") {
    import java.sql.Timestamp
    def ts(m: Int, s: Int) =
      Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")
    // u1 window 0 has 4 events (2 tied), window 1 has 1; k=2
    val rows = Seq(
      ("u1", 1L, Option(ts(0, 10))), ("u1", 2L, Option(ts(0, 10))),
      ("u1", 3L, Option(ts(0, 20))), ("u1", 4L, Option(ts(0, 30))),
      ("u1", 5L, Option(ts(1, 10))),
      ("u2", 6L, Option(ts(0, 5))), ("u2", 7L, Option.empty[Timestamp])
    ).toDF("k", "event_id", "ts")
    val got = Windows.throttleAudit(rows, "ts", Seq("k"),
      Seq("event_id"), 2, 60L)
      .orderBy("k")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("u1", 5L, 3L, 2L, 2L, 1L), // 4 in w0 -> 2 admitted; w1 all in
      ("u2", 1L, 1L, 0L, 1L, 0L)))
    intercept[IllegalArgumentException] {
      Windows.throttleAudit(rows, "ts", Seq("k"), Seq("event_id"), 0, 60L)
    }
  }
}
