package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Sampling.allocateProportional — Hamilton apportionment + hash-order
  * prefixes. */
class AllocateProportionalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus(sizes: Map[String, Int]) =
    sizes.toSeq.sortBy(_._1).flatMap { case (s, n) =>
      (0 until n).map(i => (s"$s-$i".hashCode.toLong & 0xffffffL, s))
    }.toDF("doc_id", "source")

  private def alloc(sizes: Map[String, Int], k: Long) =
    Sampling.allocateProportional(corpus(sizes), "source", k)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap

  test("exactly k rows total, proportional within one seat") {
    val sizes = Map("a" -> 500, "b" -> 300, "c" -> 150, "d" -> 50)
    for (k <- Seq(1L, 10L, 100L, 997L)) {
      val got = alloc(sizes, k)
      assert(got.values.sum == k, s"k=$k got=$got")
      for ((s, n) <- sizes; q = got.getOrElse(s, 0L))
        assert(math.abs(q - k * n / 1000.0) <= 1.0,
          s"k=$k stratum=$s quota=$q")
    }
  }

  test("largest remainders get the leftover seats deterministically") {
    // n = (a=3, b=3, c=4), k=5, N=10: base = (1,1,2), leftover 1;
    // remainders = (5,5,0) — tie between a and b broken by name: a
    assert(alloc(Map("a" -> 3, "b" -> 3, "c" -> 4), 5L) ==
      Map("a" -> 2L, "b" -> 1L, "c" -> 2L))
  }

  test("k = N selects everything; quotas never exceed stratum size") {
    val sizes = Map("a" -> 7, "b" -> 2, "c" -> 1)
    assert(alloc(sizes, 10L) == Map("a" -> 7L, "b" -> 2L, "c" -> 1L))
    for (k <- 1L to 9L) {
      val got = alloc(sizes, k)
      assert(got.values.sum == k)
      for ((s, q) <- got) assert(q <= sizes(s), s"k=$k $s")
    }
  }

  test("membership is a stable prefix: the k=20 set contains the " +
    "k=10 set for strata whose quota did not shrink") {
    val sizes = Map("a" -> 100, "b" -> 100)
    def ids(k: Long) = Sampling
      .allocateProportional(corpus(sizes), "source", k)
      .select("doc_id", "source")
      .as[(Long, String)].collect().toSet
    assert(ids(10L).subsetOf(ids(20L)))
  }

  test("NULL ids and NULL strata are dropped, not apportioned") {
    val df = Seq((Long.box(1L), "a"), (Long.box(2L), "a"),
      (null, "a"), (Long.box(3L), null))
      .toDF("doc_id", "source")
    val got = Sampling.allocateProportional(df, "source", 2L)
      .select("doc_id", "source")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a"), (2L, "a")))
  }
}
