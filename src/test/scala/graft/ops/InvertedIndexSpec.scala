package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** InvertedIndex — capped posting lists. */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def idx(rows: Seq[(Long, String)], cap: Int = 1024) =
    InvertedIndex.postings(rows.toDF("doc_id", "text"), maxPostings = cap)
      .as[(String, Long, Seq[Long], Boolean)].collect().toSeq
      .sortBy(_._1)

  test("terms dedupe per doc; postings sort ascending; df is doc count") {
    val rows = Seq(
      (3L, "the cat sat the cat"),
      (1L, "THE dog"),
      (2L, "cat"))
    assert(idx(rows) == Seq(
      ("cat", 2L, Seq(2L, 3L), false),
      ("dog", 1L, Seq(1L), false),
      ("sat", 1L, Seq(3L), false),
      ("the", 2L, Seq(1L, 3L), false)))
  }

  test("the cap keeps the SMALLEST doc_ids, df stays full, truncated " +
    "flags") {
    val rows = (1L to 10L).map(i => (i, "hot unique" + i))
    val got = idx(rows, cap = 3)
    assert(got.find(_._1 == "hot").get ==
      ("hot", 10L, Seq(1L, 2L, 3L), true))
    assert(got.count(_._1.startsWith("unique")) == 10)
    assert(got.filter(_._1.startsWith("unique")).forall(!_._4))
  }

  test("cap 0 opts out: the full list materializes") {
    val rows = (1L to 8L).map(i => (i, "common"))
    assert(idx(rows, cap = 0) ==
      Seq(("common", 8L, (1L to 8L).toSeq, false)))
  }

  test("NULL ids and NULL texts drop; whitespace-only text yields no " +
    "terms") {
    val df = Seq((Some(1L), Some("a b")), (None, Some("x")),
      (Some(2L), None), (Some(3L), Some("  \t "))).toDF("doc_id", "text")
    val got = InvertedIndex.postings(df)
      .as[(String, Long, Seq[Long], Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("a", 1L, Seq(1L), false),
      ("b", 1L, Seq(1L), false)))
  }

  test("one shuffle: the rank window and the rollup share the term " +
    "partitioning") {
    val plan = InvertedIndex.postings(
      Seq((1L, "a b")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected one Exchange:\n${plan.take(3000)}")
  }
}
