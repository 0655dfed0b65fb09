package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** HeavyHitters — bounded-state candidates + exact verification. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def hh(items: Seq[String], k: Int, parts: Int = 4) =
    HeavyHitters.frequentItems(
      items.toDF("item").repartition(parts), "item", k)
      .as[(String, Long)].collect().toSeq.sortBy(_._1)

  /** The exact definition the op must reproduce. */
  private def model(items: Seq[String], k: Int) = {
    val nn = items.filter(_ != null)
    nn.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * k >= nn.size }
      .sortBy(_._1)
  }

  test("exact counts at the exact threshold, regardless of layout") {
    // 100 rows: a=40, b=25, c=10, tail-0..24 singletons. k=4 -> n/k=25:
    // a and b pass (b EXACTLY at the boundary), c and the tail do not.
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++
      Seq.fill(10)("c") ++ (0 until 25).map(i => s"tail-$i")
    assert(hh(items, k = 4) == Seq(("a", 40L), ("b", 25L)))
    assert(hh(items, k = 4) == model(items, 4))
  }

  test("layout independence: the result is identical at 1, 3, and 17 " +
    "partitions even though the candidate sets differ") {
    val items = (0 until 1000).map { i =>
      if (i % 3 == 0) "hot" else if (i % 10 == 1) "warm" else s"t-$i"
    }
    val expected = model(items, 3)
    for (p <- Seq(1, 3, 17)) assert(hh(items, 3, p) == expected, s"p=$p")
  }

  test("superset guarantee holds under adversarial ordering: a heavy " +
    "item diluted evenly across partitions still surfaces") {
    // hot = 1/4 of rows, interleaved so every partition sees it evenly
    // diluted (the case a naive per-partition top-k would miss)
    val items = (0 until 2000).map(i =>
      if (i % 4 == 0) "hot" else s"noise-$i")
    assert(hh(items, k = 4, parts = 8) == Seq(("hot", 500L)))
  }

  test("brute-force equivalence on pseudo-random zipfish corpora") {
    for (seed <- 1 to 3) {
      val items = (0 until 3000).map { i =>
        val h = (i * 2654435761L + seed * 40503L) >>> 8
        val z = h % 100
        if (z < 30) "z0" else if (z < 45) "z1" else if (z < 52) "z2"
        else s"r-${h % 1500}"
      }
      for (k <- Seq(2, 5, 20))
        assert(hh(items, k) == model(items, k), s"seed=$seed k=$k")
    }
  }

  test("NULL items are dropped and do not count toward n") {
    // 6 non-null rows, a=3 of them; with k=2 the threshold is 3 — nulls
    // inflating n to 10 would wrongly reject a
    val items = Seq("a", "a", "a", "b", "c", "d",
      null, null, null, null)
    assert(hh(items, k = 2) == Seq(("a", 3L)))
  }

  test("empty and all-null corpora yield empty results") {
    assert(hh(Seq.empty[String], 4) == Seq.empty)
    assert(hh(Seq[String](null, null), 4) == Seq.empty)
  }

  test("k = 1: only an item covering the WHOLE corpus qualifies " +
    "(count * 1 >= n)") {
    assert(hh(Seq("a", "a", "a", "b"), 1) == Seq.empty) // 3 < 4
    assert(hh(Seq("a", "a"), 1) == Seq(("a", 2L))) // 2 >= 2
  }

  test("the verify join is keyed (no cartesian) and broadcasts the " +
    "candidate set in the common case") {
    val df = HeavyHitters.frequentItems(
      (0 until 100).map(i => s"x${i % 5}").toDF("item"), "item", 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast verify join:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("invalid k rejected") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, "item", 0)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, "item", 2000000)
    }
  }
}
