package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val eval =
    Seq((100L, "the quick brown fox jumps over dogs")).toDF("doc_id", "text")
  // eval 3-grams: {the quick brown, quick brown fox, brown fox jumps,
  //                fox jumps over, jumps over dogs}
  private lazy val train = Seq(
    (1L, "the quick brown fox jumps high"), // shares 3
    (2L, "THE  QUICK   brown cat"), // case/whitespace-normalized: shares 1
    (3L, "completely different text entirely"), // shares 0
    (4L, "fox jumps over dogs and fox jumps over dogs"), // repeats dedup: 2
    (5L, "too short") // shorter than n: no grams at all
  ).toDF("doc_id", "text")

  test("scores = distinct shared word n-grams per doc; zero-overlap docs absent") {
    val scores = Decontaminate.contaminationScores(train, eval, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(scores == Map(1L -> 3L, 2L -> 1L, 4L -> 2L))
  }

  test("decontaminate drops docs at/above minShared, keeps the rest") {
    def kept(minShared: Int): Set[Long] =
      Decontaminate.decontaminate(train, eval, n = 3, minShared = minShared)
        .select("doc_id").as[Long].collect().toSet
    assert(kept(1) == Set(3L, 5L))
    assert(kept(2) == Set(2L, 3L, 5L))
    assert(kept(4) == Set(1L, 2L, 3L, 4L, 5L)) // nobody shares 4+
  }

  test("a contaminated doc with a NULL id is still dropped (round-5 fix: " +
    "plain anti-join equality never matches null keys)") {
    val withNull = train.unionByName(Seq(
      (Option.empty[Long], "the quick brown fox jumps over dogs"), // contam
      (Option.empty[Long], "null id but perfectly clean words")    // clean
    ).toDF("doc_id", "text"))
    val kept = Decontaminate.decontaminate(withNull, eval, n = 3)
      .select("doc_id", "text").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1).take(12))).toSet
    // null ids conflate to ONE group (idCol is a key by contract), so one
    // contaminated null-id doc drops every null-id doc — conservative by
    // design: eval leakage never survives a broken ingest key. Non-null
    // behavior unchanged.
    assert(kept == Set((3L, "completely d"), (5L, "too short")),
      kept.toString)
  }
}
