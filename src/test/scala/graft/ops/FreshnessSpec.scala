package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Freshness — the bucketed two-pass max-gap must equal the naive
  * full-sort lag at every bucket width. */
class FreshnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def naive(rows: Seq[(String, Timestamp)]) =
    rows.groupBy(_._1).map { case (k, rs) =>
      val usExact = rs.map(r => r._2.getTime / 1000 * 1000000L +
        r._2.getNanos / 1000).sorted
      val gaps = usExact.zip(usExact.drop(1)).map(p => p._2 - p._1)
      (k, (rs.size.toLong, usExact.max - usExact.min,
        if (gaps.isEmpty) None else Some(gaps.max)))
    }

  test("equals the naive full-sort lag across bucket widths, " +
    "including widths that split and merge gaps arbitrarily") {
    val rows = (0 until 500).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val k = s"feed${h % 3}"
      // irregular spacing incl. ties and multi-hour silences
      val sec = (h % 7919) * 37 % 100000
      (k, new Timestamp(1704067200000L + sec * 1000L))
    }
    val df = rows.toDF("k", "ts")
    val want = naive(rows)
    for (w <- Seq(1000000L, 3600000000L, 86400000000L, 1L << 60)) {
      val got = Freshness.maxGapAudit(df, "ts", Seq("k"), w)
        .select("k", "n", "span_us", "max_gap_us")
        .as[(String, Long, Long, Option[Long])].collect()
        .map(r => (r._1, (r._2, r._3, r._4))).toMap
      assert(got == want, s"width=$w")
    }
  }

  test("single-event key: NULL max_gap (no silence observed), zero " +
    "span; null timestamps dropped; first/last are real timestamps") {
    val df = Seq(
      ("solo", Option(ts("2024-01-01 10:00:00"))),
      ("solo", Option.empty[Timestamp]),
      ("pair", Option(ts("2024-01-01 10:00:00"))),
      ("pair", Option(ts("2024-01-01 12:30:00")))
    ).toDF("k", "ts")
    val got = Freshness.maxGapAudit(df, "ts", Seq("k"), 60000000L)
      .orderBy("k")
      .as[(String, Long, Timestamp, Timestamp, Long, Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("pair", 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:30:00"),
        9000000000L, Some(9000000000L)),
      ("solo", 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"),
        0L, None)))
    intercept[IllegalArgumentException] {
      Freshness.maxGapAudit(df, "ts", Seq.empty, 1L)
    }
    intercept[IllegalArgumentException] {
      Freshness.maxGapAudit(df, "ts", Seq("k"), 0L)
    }
  }

  test("pass-1 sorts are bucket-partitioned: the wide window's " +
    "partition keys include the bucket column") {
    val df = Seq(("a", ts("2024-01-01 00:00:00"))).toDF("k", "ts")
    val plan = Freshness.maxGapAudit(df, "ts", Seq("k"), 1000000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__graft_b"), plan)
  }
}
