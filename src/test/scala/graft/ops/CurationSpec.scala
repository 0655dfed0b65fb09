package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composed curation audit: quality -> near-dup CC -> decontamination with
  * first-failing-stage attribution (Curation.curate).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("curate: every stage fires, precedence quality > near_dup > contaminated") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // keep (canonical)
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1 -> near_dup
      (3L, "zz yy"),                               // quality fail (2 tokens)
      (5L, "zz yy"),                               // ALSO a dup of 3 -> quality wins
      (4L, "planted one two three four five six")  // shares a 4-gram with eval
    ).toDF("doc_id", "text")
    val ev = Seq((99L, "one two three four")).toDF("doc_id", "text")
    val out = Curation.curate(docs, ev,
      minTokens = 3, maxTokens = 100, minMeanTokenLen = 1.0,
      maxMeanTokenLen = 100.0, minAlnumRatio = 0.1, minStopwordHits = 0,
      contamN = 4, minShared = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("drop_stage"),
          r.getAs[Boolean]("keep"))).toMap

    assert(out(1L) == ((1L, null, true)))
    assert(out(2L) == ((1L, "near_dup", false)))
    // both short docs fail quality FIRST even though 5 is also a near-dup
    assert(out(3L)._2 == "quality:too_few_tokens" && !out(3L)._3)
    assert(out(5L) == ((3L, "quality:too_few_tokens", false)))
    assert(out(4L) == ((4L, "contaminated", false)))
  }

  test("curate: shared_ngrams is 0 (not null) for docs with no overlap") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val ev = Seq((9L, "completely different eval words here")).toDF("doc_id", "text")
    val r = Curation.curate(docs, ev, minTokens = 1, minMeanTokenLen = 1.0,
      minAlnumRatio = 0.1, minStopwordHits = 0, contamN = 4).collect().head
    assert(r.getAs[Long]("shared_ngrams") == 0L)
    assert(r.getAs[Boolean]("keep"))
  }
}
