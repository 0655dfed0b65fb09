package graft.ops

import graft.SparkTestBase
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Scd — bucket-bounded run building + stitching must equal the
  * single-window naive form (width 2^60 = one bucket) at every width. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def intervals(df: org.apache.spark.sql.DataFrame, w: Long) =
    Scd.stateIntervals(df, "ts", "v", Seq("k"), w)
      .orderBy("k", "valid_from", "v")
      .as[(String, Option[String], Timestamp, Option[Timestamp], Long)]
      .collect().toSeq

  test("hand case: collapse, reopen, null state, open last interval") {
    val df = Seq(
      ("u", Some("a"), ts("2024-01-01 00:00:00")),
      ("u", Some("a"), ts("2024-01-01 01:00:00")),
      ("u", Some("b"), ts("2024-01-01 02:00:00")),
      ("u", Option.empty[String], ts("2024-01-01 03:00:00")),
      ("u", Option.empty[String], ts("2024-01-01 04:00:00")),
      ("u", Some("a"), ts("2024-01-01 05:00:00"))
    ).toDF("k", "v", "ts")
    val got = intervals(df.select("k", "v", "ts"), 3600000000L)
    assert(got == Seq(
      ("u", Some("a"), ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-01 02:00:00")), 2L),
      ("u", Some("b"), ts("2024-01-01 02:00:00"),
        Some(ts("2024-01-01 03:00:00")), 1L),
      ("u", None, ts("2024-01-01 03:00:00"),
        Some(ts("2024-01-01 05:00:00")), 2L),
      ("u", Some("a"), ts("2024-01-01 05:00:00"), None, 1L)))
  }

  test("same-ts different-value tie: deterministic zero-length " +
    "interval for the lesser value") {
    val df = Seq(
      ("u", Some("b"), ts("2024-01-01 00:00:00")),
      ("u", Some("a"), ts("2024-01-01 00:00:00"))
    ).toDF("k", "v", "ts")
    val got = intervals(df, 1000000L)
    assert(got == Seq(
      ("u", Some("a"), ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-01 00:00:00")), 1L),
      ("u", Some("b"), ts("2024-01-01 00:00:00"), None, 1L)))
  }

  test("equivalence with the single-bucket naive form across widths " +
    "on an adversarial corpus (ties, nulls, boundary-straddling runs)") {
    val rows = (0 until 2000).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val k = s"u${h % 5}"
      val v = if (h % 11 == 0) Option.empty[String]
        else Some(s"s${h % 4}")
      // second-granularity with many exact ties
      (k, v, new Timestamp(1704067200000L + (h % 500) * 1000L))
    }
    val df = rows.toDF("k", "v", "ts")
    val want = intervals(df, 1L << 60)
    for (w <- Seq(1000000L, 60000000L, 3600000000L))
      assert(intervals(df, w) == want, s"width=$w")
    intercept[IllegalArgumentException] {
      Scd.stateIntervals(df, "ts", "v", Seq.empty, 1L)
    }
  }

  test("snapshotAt: exactly one state per key with history at T, " +
    "half-open edges, pre-history keys absent, open interval covers") {
    import org.apache.spark.sql.functions.expr
    val df = Seq(
      ("u", Some("a"), ts("2024-01-01 00:00:00")),
      ("u", Some("b"), ts("2024-01-01 02:00:00")),
      ("w", Some("x"), ts("2024-01-01 03:00:00"))
    ).toDF("k", "v", "ts")
    val iv = Scd.stateIntervals(df, "ts", "v", Seq("k"), 3600000000L)
    def at(s: String) = Scd.snapshotAt(iv,
      expr(s"TIMESTAMP '$s'"), Seq("k"), "v")
      .orderBy("k")
      .as[(String, Option[String], Timestamp, Long)].collect().toSeq
    // at the exact boundary the NEW state is in force (half-open)
    assert(at("2024-01-01 02:00:00") == Seq(
      ("u", Some("b"), ts("2024-01-01 02:00:00"), 1L)))
    assert(at("2024-01-01 01:59:59") == Seq(
      ("u", Some("a"), ts("2024-01-01 00:00:00"), 1L)))
    // open last intervals cover arbitrarily late times; w now exists
    assert(at("2030-01-01 00:00:00").map(r => (r._1, r._2)) ==
      Seq(("u", Some("b")), ("w", Some("x"))))
    // before all history: empty
    assert(at("2023-01-01 00:00:00").isEmpty)
  }
}
