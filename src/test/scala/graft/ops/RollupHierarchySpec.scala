package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rollups.hierarchicalRollup — one-pass prefix granularities. */
class RollupHierarchySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("a", "x", 10L), ("a", "x", 20L), ("a", "y", 5L),
    ("b", "x", 1L), ("b", null, 7L)).toDF("k1", "k2", "v")

  private def rows = Rollups.hierarchicalRollup(df, Seq("k1", "k2"),
    Seq(count(lit(1)).as("n"), sum($"v").as("s")))
    .collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getInt(4))).toSeq.sortBy(t =>
      (t._5, Option(t._1).getOrElse(""), Option(t._2).getOrElse("")))

  test("all prefix levels present with correct counts and sums") {
    assert(rows == Seq(
      ("a", "x", 2L, 30L, 0), ("a", "y", 1L, 5L, 0),
      ("b", null, 1L, 7L, 0), ("b", "x", 1L, 1L, 0),
      ("a", null, 3L, 35L, 1), ("b", null, 2L, 8L, 1),
      (null, null, 5L, 43L, 3)))
  }

  test("gid distinguishes a genuine NULL key (gid 0) from a rolled-up " +
    "level (gid 1): both ('b', null) rows exist with different gids") {
    val bNull = rows.filter(t => t._1 == "b" && t._2 == null)
    assert(bNull.map(_._5).sorted == Seq(0, 1))
    assert(bNull.find(_._5 == 0).get._3 == 1L) // the real null-key row
    assert(bNull.find(_._5 == 1).get._3 == 2L) // the k1 subtotal
  }

  test("single pass: exactly one Exchange in the physical plan") {
    val plan = Rollups.hierarchicalRollup(df, Seq("k1", "k2"),
      Seq(count(lit(1)).as("n")))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
    assert(plan.contains("Expand"), "rollup rides one Expand")
  }

  test("guards: empty levels / empty aggs rejected") {
    intercept[IllegalArgumentException] {
      Rollups.hierarchicalRollup(df, Seq.empty,
        Seq(count(lit(1)).as("n")))
    }
    intercept[IllegalArgumentException] {
      Rollups.hierarchicalRollup(df, Seq("k1"), Seq.empty)
    }
  }
}
