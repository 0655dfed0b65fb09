package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Tfidf — distinctive-term extraction. */
class TfidfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("ranking: tf desc, then RARER term first (df asc), then term asc; " +
    "top-k cut; df counts documents not occurrences") {
    val df = Seq(
      (1L, "zebra zebra common common rare"),
      (2L, "common words here zebra"),
      (3L, "common other words")
    ).toDF("doc_id", "text")
    val got = Tfidf.topTerms(df, k = 2)
      .select("doc_id", "term", "tf", "df", "rank")
      .as[(Long, String, Long, Long, Int)].collect().toSeq
      .sortBy(r => (r._1, r._5))
    // doc 1: zebra tf=2 df=2, common tf=2 df=3 -> zebra first (rarer)
    assert(got.filter(_._1 == 1L) ==
      Seq((1L, "zebra", 2L, 2L, 1), (1L, "common", 2L, 3L, 2)))
    // doc 2: all tf=1 -> df asc, then term asc among df ties
    assert(got.filter(_._1 == 2L) ==
      Seq((2L, "here", 1L, 1L, 1), (2L, "words", 1L, 2L, 2)))
  }

  test("tokenizer is the shared normalizer: lowercase, whitespace split, " +
    "minTermLen drops short terms; empty docs emit nothing") {
    val df = Seq((1L, "The THE the a b xy"), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
    val got = Tfidf.topTerms(df, k = 10)
      .select("doc_id", "term", "tf").as[(Long, String, Long)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, "the", 3L), (1L, "xy", 1L)))
  }

  test("no self-join: plan has only linear aggregates + one equi-join " +
    "with the per-term df side") {
    val df = Seq((1L, "a few words")).toDF("doc_id", "text")
    val plan = Tfidf.topTerms(df, k = 3)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }

  test("k must be positive") {
    val df = Seq((1L, "x y")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Tfidf.topTerms(df, 0))
  }
}
