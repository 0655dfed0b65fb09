package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** IndicatorTimeline — first/last seen + rarity triage over matches. */
class IndicatorTimelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("aggregates per value and ranks rarest-first within each type") {
    val matched = Seq(
      // v1: 3 matches across 2 convs
      ("c1", 0, "d1", "domain", "v1"),
      ("c1", 1, "d1", "domain", "v1"),
      ("c2", 0, "d1", "domain", "v1"),
      // v2: 1 match, 1 conv -> rarer than v1
      ("c1", 2, "d1", "domain", "v2"),
      // w: different type, own rank space
      ("c2", 1, "d1", "ipv4", "9.9.9.9"))
      .toDF("conv_id", "turn_idx", "database_id", "indicator_type",
        "value")
    val turns = Seq(
      ("c1", 0, ts(10L)), ("c1", 1, ts(20L)), ("c1", 2, ts(15L)),
      ("c2", 0, ts(30L)), ("c2", 1, ts(5L)),
      ("c9", 0, ts(99L))) // unmatched turn contributes nothing
      .toDF("conv_id", "turn_idx", "ts")
    val got = IndicatorTimeline.timeline(matched, turns)
      .select("database_id", "indicator_type", "value", "n_matches",
        "n_convs", "first_seen_us", "last_seen_us", "rarity_rank")
      .as[(String, String, String, Long, Long, Long, Long, Int)]
      .collect().toSeq.sortBy(r => (r._2, r._3))
    assert(got == Seq(
      ("d1", "domain", "v1", 3L, 2L, 10000000L, 30000000L, 2),
      ("d1", "domain", "v2", 1L, 1L, 15000000L, 15000000L, 1),
      ("d1", "ipv4", "9.9.9.9", 1L, 1L, 5000000L, 5000000L, 1)))
  }

  test("rarity ties break deterministically by (n_convs, n_matches, " +
    "value)") {
    val matched = Seq(
      ("c1", 0, "d1", "domain", "b"), // 1 conv, 1 match
      ("c1", 1, "d1", "domain", "a"), // 1 conv, 1 match -> ties, a first
      ("c1", 2, "d1", "domain", "c"),
      ("c2", 0, "d1", "domain", "c")) // 2 convs -> last
      .toDF("conv_id", "turn_idx", "database_id", "indicator_type",
        "value")
    val turns = Seq(("c1", 0, ts(1L)), ("c1", 1, ts(2L)),
      ("c1", 2, ts(3L)), ("c2", 0, ts(4L)))
      .toDF("conv_id", "turn_idx", "ts")
    val got = IndicatorTimeline.timeline(matched, turns)
      .select("value", "rarity_rank").as[(String, Int)]
      .collect().toSeq.sortBy(_._2)
    assert(got == Seq(("a", 1), ("b", 2), ("c", 3)))
  }

  test("NULL turn timestamps count matches but contribute no timeline " +
    "bounds") {
    val matched = Seq(
      ("c1", 0, "d1", "domain", "v"),
      ("c1", 1, "d1", "domain", "v"))
      .toDF("conv_id", "turn_idx", "database_id", "indicator_type",
        "value")
    val turns = Seq(("c1", 0, Some(ts(10L))), ("c1", 1, None))
      .toDF("conv_id", "turn_idx", "ts")
    val got = IndicatorTimeline.timeline(matched, turns)
      .select("n_matches", "first_seen_us", "last_seen_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 10000000L, 10000000L)))
  }
}
