package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Profile — exact per-column stats, one corpus pass. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("a", Some(1L), "x"), ("b", Some(2L), "x"), ("a", None, "y"),
    (null, Some(2L), "x"), ("c", None, null))
    .toDF("k", "v", "t")

  test("rows, nulls, and exact distincts per column") {
    val got = Profile.columnStats(df, Seq("k", "v", "t"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("k", 5L, 1L, 3L),  // a, b, c
      ("t", 5L, 1L, 2L),  // x, y
      ("v", 5L, 2L, 2L))) // 1, 2
  }

  test("single pass: the corpus is scanned once (one aggregate job, " +
    "explode-unpivot — not a union re-running it per column)") {
    val plan = Profile.columnStats(df, Seq("k", "v", "t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan)
  }

  test("all-null and constant columns profile correctly") {
    val d = Seq((null: String, 7L), (null, 7L), (null, 7L))
      .toDF("n", "c")
    val got = Profile.columnStats(d, Seq("n", "c"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("c", 3L, 0L, 1L), ("n", 3L, 3L, 0L)))
  }

  test("empty input: zero rows, zero distincts") {
    val d = Seq.empty[(String, Long)].toDF("a", "b")
    val got = Profile.columnStats(d, Seq("a", "b"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 0L, 0L, 0L), ("b", 0L, 0L, 0L)))
  }

  test("empty column list rejected") {
    intercept[IllegalArgumentException] {
      Profile.columnStats(df, Seq.empty)
    }
  }
}
