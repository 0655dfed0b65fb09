package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** TopK — quota-first selection vs post-filtering, determinism, null
  * handling. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("capped slots are refilled from other groups (quota-first, not " +
    "post-filtered), ties rank by id, null scores drop") {
    // group A has the 3 best scores but quota 2: the third-best A row
    // must yield to B's best
    val rows = Seq(
      (1L, "A", Some(100L)), (2L, "A", Some(90L)), (3L, "A", Some(80L)),
      (4L, "B", Some(50L)), (5L, "B", Some(40L)),
      (6L, "C", Some(50L)), // ties with id 4: id asc -> 4 first
      (7L, "C", None)
    ).toDF("id", "g", "score")
    val got = TopK.diversifiedTopK(rows, "score", "id", "g", 2, 4)
      .as[(Int, Long, String, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1, 1L, "A", Some(100L)), (2, 2L, "A", Some(90L)),
      (3, 4L, "B", Some(50L)), (4, 6L, "C", Some(50L))))
  }

  test("selected set maximizes total score among quota-feasible sets " +
    "(brute-force check on a small corpus)") {
    val rows = (0 until 24).map { i =>
      (i.toLong, s"g${i % 4}", ((i * 2654435761L) % 97L))
    }
    val df = rows.toDF("id", "g", "score")
    val got = TopK.diversifiedTopK(df, "score", "id", "g", 2, 5)
      .as[(Int, Long, String, Long)].collect().toSeq
    val gotScore = got.map(_._4).sum
    // brute force: all 5-subsets obeying <=2 per group
    val best = rows.combinations(5)
      .filter(c => c.groupBy(_._2).values.forall(_.size <= 2))
      .map(_.map(_._3).sum).max
    assert(gotScore == best)
    assert(got.map(_._1) == (1 to 5))
    intercept[IllegalArgumentException] {
      TopK.diversifiedTopK(df, "score", "id", "g", 0, 5)
    }
  }
}
