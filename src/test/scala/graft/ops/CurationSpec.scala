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
    // word-5-gram minhash needs >= 5 tokens per doc to shingle at all, so
    // the quality-fail docs (3, 5) carry 6 identical tokens: enough to be
    // a real near-dup pair, but below the minTokens=7 bar — precedence
    // must still attribute them to quality, not near_dup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // keep
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // -> near_dup
      (3L, "zz yy xx ww vv uu"),                   // quality fail (6 < 7)
      (5L, "zz yy xx ww vv uu"),                   // dup of 3 -> quality wins
      (4L, "planted one two three four five six seven") // shares eval 4-gram
    ).toDF("doc_id", "text")
    val ev = Seq((99L, "one two three four")).toDF("doc_id", "text")
    val out = Curation.curate(docs, ev,
      minTokens = 7, maxTokens = 100, minMeanTokenLen = 1.0,
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

  test("curate releases every staged checkpoint, incl. the CC label table " +
    "behind the clusters projection (round-5 find)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "different words entirely over here my friend today")
    ).toDF("doc_id", "text")
    val ev = Seq((9L, "unrelated eval words")).toDF("doc_id", "text")
    // RDD ID SETS, not counts: the async ContextCleaner may collect
    // pre-existing pins from earlier suites mid-test; new-id differences
    // are immune to that
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val out = Curation.curate(docs, ev, minTokens = 1, minMeanTokenLen = 1.0,
      maxMeanTokenLen = 100.0, minAlnumRatio = 0.1, minStopwordHits = 0)
    assert(out.count() == 3)
    def newIds = spark.sparkContext.getPersistentRDDs.keySet.toSet -- beforeIds
    // only the returned verdict table (ONE doc-sized checkpoint) may
    // remain pinned; tokens/banded/label checkpoints must all be released
    assert(newIds.size <= 1,
      s"curate leaked staged checkpoints: new persistent RDDs $newIds")
    // release the one LEGITIMATE pin (the returned verdict checkpoint) and
    // require every NEW pin gone: the <=1 slack alone could mask one
    // leaked staged checkpoint if the verdict pin were ever removed
    // (round-5 test-review find)
    Checkpoints.releaseLocalDeep(out)
    assert(newIds.isEmpty,
      s"a non-verdict checkpoint stayed pinned: $newIds")
  }

}
