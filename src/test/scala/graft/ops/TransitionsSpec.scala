package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Transitions — per-entity bigram counts + conditional probabilities. */
class TransitionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (event_id, user_id, sec, event_type)
  private def bigrams(rows: (Long, Option[Long], Long, String)*) =
    Transitions.bigramCounts(
      rows.toSeq.toDF("event_id", "user_id", "sec", "event_type")
        .selectExpr("event_id", "user_id",
          "timestamp_seconds(sec) AS ts", "event_type"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("adjacent pairs within each user; first event starts nothing; " +
    "p sums to 1 per prev") {
    val got = bigrams(
      (1L, Some(1L), 10L, "view"), (2L, Some(1L), 20L, "click"),
      (3L, Some(1L), 30L, "view"), (4L, Some(1L), 40L, "click"),
      (5L, Some(2L), 10L, "view"), (6L, Some(2L), 20L, "error"),
      (7L, Some(3L), 10L, "purchase")) // singleton: no transition
    assert(got == Map(
      ("view", "click") -> (2L, 2.0 / 3.0),
      ("view", "error") -> (1L, 1.0 / 3.0),
      ("click", "view") -> (1L, 1.0)))
  }

  test("equal timestamps order by event_id (deterministic bigrams)") {
    val got = bigrams(
      (2L, Some(1L), 10L, "b"), (1L, Some(1L), 10L, "a"),
      (3L, Some(1L), 10L, "c"))
    assert(got.keySet == Set(("a", "b"), ("b", "c")))
  }

  test("NULL users are not one anonymous entity, and NULL order keys " +
    "have no stream position: both dropped") {
    val got = bigrams(
      (1L, None, 10L, "view"), (2L, None, 20L, "click"), // phantom pair
      (3L, Some(1L), 30L, "view"), (4L, Some(1L), 40L, "click"))
    assert(got == Map(("view", "click") -> (1L, 1.0)))
    val nullTs = Transitions.bigramCounts(
      Seq((1L, 1L, Some(10L), "a"), (2L, 1L, Option.empty[Long], "b"),
        (3L, 1L, Some(30L), "c"))
        .toDF("event_id", "user_id", "sec", "event_type")
        .selectExpr("event_id", "user_id",
          "timestamp_seconds(sec) AS ts", "event_type"))
      .as[(String, String, Long, Double)].collect()
    assert(nullTs.map(r => (r._1, r._2)).toSet == Set(("a", "c")))
  }

  test("empty input -> empty output (no NULL-row artifacts)") {
    assert(bigrams().isEmpty)
  }

  test("empty orderCols is a loud, named error (not empty.reduce)") {
    intercept[IllegalArgumentException] {
      Transitions.bigramCounts(
        Seq((1L, 1L, "a")).toDF("event_id", "user_id", "event_type"),
        orderCols = Nil)
    }
  }
}
