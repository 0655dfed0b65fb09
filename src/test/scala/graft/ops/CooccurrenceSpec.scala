package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Cooccurrence — entity-scoped item pair counts, marginals and lift. */
class CooccurrenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def run(rows: Seq[(Option[Long], Option[String])],
      maxItems: Int = Cooccurrence.DefaultMaxItems) =
    Cooccurrence.pairCounts(rows.toDF("e", "i"), col("e"), col("i"),
      maxItems)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

  test("pair counts, marginals and lift match the by-hand model; " +
    "within-entity duplicates count once") {
    // e1: {a,b,c}  e2: {a,b}  e3: {a}  (duplicate (e1,a) row collapses)
    val got = run(Seq(
      Some(1L) -> Some("a"), Some(1L) -> Some("a"), Some(1L) -> Some("b"),
      Some(1L) -> Some("c"), Some(2L) -> Some("b"), Some(2L) -> Some("a"),
      Some(3L) -> Some("a")))
    // N=3, c(a)=3, c(b)=2, c(c)=1
    assert(got == Map(
      ("a", "b") -> ((2L, 3L, 2L, 2.0 * 3.0 / (3.0 * 2.0))),
      ("a", "c") -> ((1L, 3L, 1L, 1.0 * 3.0 / (3.0 * 1.0))),
      ("b", "c") -> ((1L, 2L, 1L, 1.0 * 3.0 / (2.0 * 1.0)))))
  }

  test("NULL entities and NULL items drop; single-item entities mint " +
    "no pairs but still count in N and marginals") {
    val got = run(Seq(
      None -> Some("a"), None -> Some("b"),      // phantom entity
      Some(1L) -> None,                          // null item
      Some(1L) -> Some("a"), Some(1L) -> Some("b"),
      Some(2L) -> Some("a")))
    // N=2, c(a)=2, c(b)=1: lift(a,b) = 1*2/(2*1) = 1.0
    assert(got == Map(("a", "b") -> ((1L, 2L, 1L, 1.0))))
  }

  test("maxItems guard raises a loud error by default; 0 opts out") {
    val wide = (0 until 10).map(i => Some(5L) -> Some(s"i$i"))
    val ex = intercept[Exception] { run(wide, maxItems = 4) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxItems=4")))
    assert(run(wide, maxItems = 0).size == 45) // 10 choose 2
  }

  test("item_a < item_b in binary order for every output pair") {
    val got = run(Seq(Some(1L) -> Some("z"), Some(1L) -> Some("a"),
      Some(1L) -> Some("m")))
    assert(got.keySet == Set(("a", "m"), ("a", "z"), ("m", "z")))
  }
}
