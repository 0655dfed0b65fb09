package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rollups.mergePartials — incremental maintenance must equal the
  * from-scratch aggregate. */
class MergePartialsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val rows = (0 until 3000).map { i =>
    (s"k${i % 7}", i.toLong, (i * 13 % 101).toLong)
  }.toDF("k", "id", "v")

  private def aggOf(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("s"),
      min($"v").as("mn"), max($"v").as("mx"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "n", "s", "mn", "mx")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("merging N daily partials equals the from-scratch aggregate") {
    val parts = (0 until 5).map(d => aggOf(rows.where($"id" % 5 === d)))
    val merged = Rollups.mergePartials(parts, Seq("k"),
      Seq(("n", "count"), ("s", "sum"), ("mn", "min"), ("mx", "max")))
    assert(canon(merged) == canon(aggOf(rows)))
  }

  test("partials with different column ORDER merge correctly " +
    "(unionByName, not positional union)") {
    val p1 = aggOf(rows.where($"id" % 2 === 0))
    val p2 = aggOf(rows.where($"id" % 2 === 1))
      .select("mx", "k", "mn", "s", "n")
    val merged = Rollups.mergePartials(Seq(p1, p2), Seq("k"),
      Seq(("n", "count"), ("s", "sum"), ("mn", "min"), ("mx", "max")))
    assert(canon(merged) == canon(aggOf(rows)))
  }

  test("a key present in only some partials still merges") {
    val p1 = aggOf(rows.where($"k" === "k1"))
    val p2 = aggOf(rows.where($"k" =!= "k1"))
    val merged = Rollups.mergePartials(Seq(p1, p2), Seq("k"),
      Seq(("n", "count"), ("s", "sum"), ("mn", "min"), ("mx", "max")))
    assert(canon(merged) == canon(aggOf(rows)))
  }

  test("non-algebraic kinds are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Rollups.mergePartials(Seq(aggOf(rows)), Seq("k"),
        Seq(("n", "avg")))
    }
    assert(e.getMessage.contains("non-algebraic"))
  }

  test("idempotence of a single partial: merge(x) == x re-keyed") {
    val p = aggOf(rows)
    val merged = Rollups.mergePartials(Seq(p), Seq("k"),
      Seq(("n", "count"), ("s", "sum"), ("mn", "min"), ("mx", "max")))
    assert(canon(merged) == canon(p))
  }
}
