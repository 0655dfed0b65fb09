package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Vocab — frequency-weighted BPE merge-pair counts. */
class VocabSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(docs: Seq[(String, String)], topK: Int) =
    Vocab.bpeMergeCounts(docs.toDF("doc_id", "text"), topK)
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)

  /** Brute-force model: word freqs, then weighted in-word char pairs. */
  private def model(docs: Seq[(String, String)], topK: Int) = {
    val words = docs.filter(d => d._1 != null && d._2 != null)
      .flatMap(_._2.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong)
    val pairs = freq.toSeq.flatMap { case (w, f) =>
      w.sliding(2).filter(_.length == 2).toSeq.map(p => (p, f))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    pairs.sortBy { case (p, tot) => (-tot, p) }.take(topK)
      .zipWithIndex.map { case ((p, tot), i) => (p, tot, i + 1) }
  }

  test("hand-computed merge table: the classic low/lower/lowest corpus") {
    // freqs: low=3, lower=1, lowest=1, newest=2
    val docs = Seq(("d1", "low lower low lowest"),
      ("d2", "low newest NEWEST"))
    val got = run(docs, 3)
    // pair totals: lo=5 ow=5 we=3 es=3 st=3 ne=2 ew=3 er=1 ...
    // 'ew' rides newest(2)+lowest(1)? no: lowest has 'we','es','st';
    // 'ew' appears in newest only (2). Model is the referee:
    assert(got == model(docs, 3))
    assert(got.head._2 == 5L) // the first merge weight
    assert(got.map(_._1).take(2) == Seq("lo", "ow")) // tie -> pair asc
  }

  test("frequency weighting: a repeated word outweighs many distinct " +
    "words sharing no pair") {
    val docs = Seq(("a", "zz zz zz xy"), ("b", "ab cd ef"))
    val got = run(docs, 1)
    assert(got == Seq(("zz", 3L, 1)))
    assert(got == model(docs, 1))
  }

  test("single-char words contribute nothing; NULL ids/texts dropped; " +
    "topK domain enforced") {
    val docs = Seq(("a", "x y z a b"), (null, "qq qq"), ("c", null))
    assert(run(docs, 5).isEmpty)
    intercept[IllegalArgumentException] { run(docs, 0) }
  }

  test("brute-force equivalence on a mixed corpus (weights, ties, " +
    "repeats, multi-char overlap like 'aaa' -> two 'aa' pairs)") {
    val docs = (0 until 40).map { i =>
      ("d" + i, Seq("aaa", "banana", "bandana", s"w${i % 7}x${i % 3}",
        "aaa").take(2 + i % 4).mkString(" "))
    }
    assert(run(docs, 15) == model(docs, 15))
  }

  test("oovRate: coverage vs a literal recount; per-group view exposes " +
    "what the corpus average hides; type vs occurrence counts differ") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "en", "the cat the dog the cat"),
      (2L, "en", "the cat runs"),
      (3L, "xx", "zq zq wv")
    ).toDF("doc_id", "lang", "text")
    // corpus freqs: the=4, cat=3, zq=2, dog=1, runs=1, wv=1
    // vocabSize=2 -> {the, cat}
    val got = Vocab.oovRate(docs, 2, Seq("lang"))
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // en: 9 tokens, oov = dog(1)+runs(1) = 2 occurrences, 2 types
    // xx: 3 tokens, all oov (zq x2, wv) = 3 occurrences, 2 types
    assert(got == Seq(
      ("en", 9L, 2L, 2L, 222L),
      ("xx", 3L, 3L, 2L, 1000L)))
    intercept[IllegalArgumentException] {
      Vocab.oovRate(docs, 0, Seq("lang"))
    }
  }
}
