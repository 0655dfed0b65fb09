package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Concentration — exact Gini vs hand math and a brute-force pair
  * formula; degenerate cases. */
class ConcentrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Option[Long])]) =
    Concentration.actorConcentration(rows.toDF("g", "a"), Seq("g"), "a")
      .orderBy("g")
      .as[(String, Long, Long, BigDecimal, BigDecimal)]
      .collect().toSeq
      .map(r => (r._1, r._2, r._3, r._4.toLong, r._5.toLong))

  test("uniform -> 0, one-actor dominance, hand-checked mixed case, " +
    "single actor -> 0, NULL actor is a real bucket") {
    // uniform: 3 actors x 2 events -> G = 0
    val uni = (1 to 3).flatMap(i => Seq.fill(2)(("u", Some(i.toLong))))
    // mixed: x = (1, 1, 4): sorted i*x = 1+2+12 = 15
    //   G = (2*15 - 4*6) / (3*6) = 6/18 -> 333 permille; top1 = 666
    val mixed = Seq.fill(4)(("m", Some(9L))) ++
      Seq(("m", Some(1L)), ("m", Some(2L)))
    // null actor carries half the volume
    val withNull = Seq(("n", Option.empty[Long]),
      ("n", Option.empty[Long]), ("n", Some(5L)), ("n", Some(6L)))
    val solo = Seq.fill(5)(("s", Some(1L)))
    val got = run(uni ++ mixed ++ withNull ++ solo)
    assert(got == Seq(
      ("m", 3L, 6L, 333L, 666L),
      ("n", 3L, 4L, 166L, 500L), // x=(1,1,2): (2*9-4*4)/12 = 2/12
      ("s", 1L, 5L, 0L, 1000L),
      ("u", 3L, 6L, 0L, 333L)))
  }

  test("matches the brute-force pairwise-difference definition " +
    "G = sum|xi-xj| / (2 n sum_x) on a random distribution") {
    val rows = (0 until 500).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      ("r", Some(h % 37L))
    }
    val xs = rows.groupBy(_._2).map(_._2.size.toLong).toSeq
    val n = xs.size.toLong
    val tot = xs.sum
    val num = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
    val wantPermille = num * 1000 / (2 * n * tot)
    val got = run(rows)
    assert(got.head._4 == wantPermille,
      s"got ${got.head._4} want $wantPermille")
  }
}
