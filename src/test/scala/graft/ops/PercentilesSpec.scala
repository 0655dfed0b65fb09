package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Percentiles.nearestRank — integer-permille nearest-rank selection. */
class PercentilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(rows: Seq[(String, java.lang.Double)],
      ps: Seq[(String, Int)]): Map[String, Seq[Double]] =
    Percentiles.nearestRank(rows.toDF("k", "v"), Seq("k"), "v", ps)
      .collect()
      .map(r => r.getString(0) ->
        (1 until r.length).map(r.getDouble).toSeq).toMap

  test("nearest-rank definition: ceil(p*n) 1-based, p1000 = max, " +
    "odd and even group sizes") {
    val a = (1 to 5).map(i => ("a", java.lang.Double.valueOf(i))) // n=5
    val b = (1 to 4).map(i => ("b", java.lang.Double.valueOf(i))) // n=4
    val got = run(a ++ b,
      Seq("50" -> 500, "75" -> 750, "100" -> 1000))
    // n=5: ranks ceil(2.5)=3, ceil(3.75)=4, 5
    assert(got("a") == Seq(3.0, 4.0, 5.0))
    // n=4: ranks 2, 3, 4
    assert(got("b") == Seq(2.0, 3.0, 4.0))
  }

  test("the float-ceil off-by-one regression: p950 at n=40 ranks 38, " +
    "not 39 (IEEE 0.95*40 = 38.000000000000001)") {
    val rows = (1 to 40).map(i => ("a", java.lang.Double.valueOf(i)))
    assert(run(rows, Seq("95" -> 950))("a") == Seq(38.0))
  }

  test("ties pick a deterministic VALUE; nulls excluded from n") {
    val rows = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 2.0), ("a", null))
    // n=4 (null dropped); p500 -> rank 2 -> value 2.0 whatever the
    // tie order; p1000 -> rank 4 -> 2.0
    assert(run(rows, Seq("50" -> 500, "100" -> 1000))("a") ==
      Seq(2.0, 2.0))
  }

  test("permille bounds enforced") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Percentiles.nearestRank(df, Seq("k"), "v", Seq("0" -> 0))
    }
    intercept[IllegalArgumentException] {
      Percentiles.nearestRank(df, Seq("k"), "v", Nil)
    }
  }
}
