package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Paths — prefix paths, determinism under collection order, null
  * rendering, tie-broken ranks. */
class PathsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("prefix cap, counts, rank tie-break by path, null rendering") {
    // s1: a,b,c,d (cap 3 -> a>b>c); s2: a,b,c; s3: a,null; s4: x
    val rows = Seq(
      ("s1", 1L, Some("a")), ("s1", 2L, Some("b")), ("s1", 3L, Some("c")),
      ("s1", 4L, Some("d")),
      ("s2", 1L, Some("a")), ("s2", 2L, Some("b")), ("s2", 3L, Some("c")),
      ("s3", 1L, Some("a")), ("s3", 2L, None),
      ("s4", 1L, Some("x"))
    ).toDF("sess", "seq", "t")
    val got = Paths.topPaths(rows, Seq("sess"), Seq("seq"), "t", 3, 10)
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1, "a>b>c", 2L), // cap folds s1 into s2's path
      (2, "a>(null)", 1L), // ties n=1: path asc
      (3, "x", 1L)))
  }

  test("topK truncates after ranking; the per-group state is capped " +
    "BEFORE collection (filter under the window, not inside the agg)") {
    val rows = (0 until 300).map(i => (s"s${i % 30}", i.toLong,
      s"e${i % 3}")).toDF("sess", "seq", "t")
    val got = Paths.topPaths(rows, Seq("sess"), Seq("seq"), "t", 4, 2)
      .as[(Int, String, Long)].collect().toSeq
    assert(got.size == 2 && got.map(_._1) == Seq(1, 2))
    val plan = Paths.topPaths(rows, Seq("sess"), Seq("seq"), "t", 4, 2)
      .queryExecution.executedPlan.toString
    // the maxLen filter must sit between the window and the aggregate
    val iAgg = plan.indexOf("ObjectHashAggregate")
    assert(plan.indexOf("__graft_rn <= 4", iAgg) > 0 ||
      plan.indexOf("(__graft_rn#", iAgg) > 0, plan)
    intercept[IllegalArgumentException] {
      Paths.topPaths(rows, Seq("sess"), Seq("seq"), "t", 0, 2)
    }
  }
}
