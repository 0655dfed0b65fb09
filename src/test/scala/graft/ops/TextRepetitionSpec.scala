package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher repetition-rule family: duplicate-line fractions (map-side HOFs)
  * and the top word-n-gram character fraction (multiplicity-counted).
  */
class TextRepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("repetitionSignals: dup-line fractions count repeats beyond first") {
    // 4 lines: "aa" twice (2 chars each), "bbbb", "cc" -> 1 dup line of 4,
    // dup chars = 2 of 10
    val df = Seq((1L, "aa\nbbbb\naa\ncc")).toDF("doc_id", "text")
    val r = TextStats.repetitionSignals(df).collect().head
    assert(r.getAs[Int]("n_lines") == 4)
    assert(r.getAs[Double]("dup_line_frac") == 1.0 / 4.0)
    assert(r.getAs[Double]("dup_line_char_frac") == 2.0 / 10.0)
  }

  test("repetitionSignals: single-line doc has zero dup fractions") {
    val df = Seq((1L, "no newlines here at all")).toDF("doc_id", "text")
    val r = TextStats.repetitionSignals(df).collect().head
    assert(r.getAs[Int]("n_lines") == 1)
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.0)
  }

  test("repetitionSignals: bullet-start and ellipsis-end line fractions") {
    val text = Seq(
      "- first bullet",
      "* second bullet",
      "• third bullet",
      "1. numbered bullet",
      "2) also numbered",
      "trailing dots...",
      "unicode ellipsis…",
      "plain line").mkString("\n")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextStats.repetitionSignals(df).collect().head
    assert(r.getAs[Int]("n_lines") == 8)
    assert(r.getAs[Double]("bullet_line_frac") == 5.0 / 8.0)
    assert(r.getAs[Double]("ellipsis_line_frac") == 2.0 / 8.0)
  }

  test("topNgramCharFrac: counts multiplicity and breaks ties by gram") {
    // "x y" occurs twice, everything else once -> top gram "x y"
    val df = Seq((1L, "x y z x y")).toDF("doc_id", "text")
    val r = TextStats.topNgramCharFrac(df, n = 2).collect().head
    assert(r.getAs[String]("top_gram") == "x y")
    assert(r.getAs[Long]("top_gram_n") == 2L)
    // 2 occurrences * 3 chars / 9 chars of text
    assert(r.getAs[Double]("top_gram_char_frac") == 6.0 / 9.0)

    // all 2-grams unique -> lexicographically smallest wins
    val tie = Seq((1L, "b c a b")).toDF("doc_id", "text")
    val rt = TextStats.topNgramCharFrac(tie, n = 2).collect().head
    assert(rt.getAs[String]("top_gram") == "a b")
    assert(rt.getAs[Long]("top_gram_n") == 1L)
  }

  test("topNgramCharFrac: docs shorter than n tokens produce no row") {
    val df = Seq((1L, "solo"), (2L, "two words")).toDF("doc_id", "text")
    val out = TextStats.topNgramCharFrac(df, n = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(2L))
  }

  test("repetition signals stay shuffle-free (no Exchange in the plan)") {
    val df = Seq((1L, "a\nb\na")).toDF("doc_id", "text")
    val plan = TextStats.repetitionSignals(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // the staged line array must survive optimization: one split, not one
    // per derived stat (the five stats reference the array eight times);
    // range source so ConvertToLocalRelation can't fold the plan away
    val opt = TextStats.repetitionSignals(rangeDocs("a\nb\na\n"))
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(opt).length
    assert(splits == 1, s"expected 1 split, found $splits:\n$opt")
  }

  test("topNgramCharFrac: trigrams (n=3) via the zip_with chain") {
    // "x y x y x y" -> trigrams: "x y x" x2, "y x y" x1 (doc_len = 11)
    val df = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
    val r = TextStats.topNgramCharFrac(df, n = 3).collect().head
    assert(r.getAs[String]("top_gram") == "x y x")
    assert(r.getAs[Long]("top_gram_n") == 2L)
    assert(r.getAs[Double]("top_gram_char_frac") == 2.0 * 5.0 / 11.0)
  }

  // The q48 lesson, pinned: higher-order-function lambdas re-evaluate
  // non-lambda subexpressions per ELEMENT (no CSE, no codegen), so the
  // tokenizing split() must be materialized as its own projection and only
  // referenced (O(1)) from the gram lambdas. If a future optimizer change
  // (CollapseProject heuristics) inlined it back, the plan would carry the
  // split inside a lambda again and gram construction would be O(tokens^2)
  // in the document length (observed: 407 s for 40 multi-MB docs).
  // spark.range sources (NOT Seq.toDF): a LocalRelation gets its projections
  // constant-folded away by ConvertToLocalRelation, hiding the plan shape.
  private def rangeDocs(text: String) =
    spark.range(2).select(col("id").as("doc_id"),
      concat(lit(text), col("id")).as("text"))

  test("topNgramCharFrac: exactly one split() in the optimized plan") {
    val plan = TextStats.topNgramCharFrac(rangeDocs("a b c a b "), n = 2)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).length
    assert(splits == 1, s"expected 1 split, found $splits:\n$plan")
  }

  test("bandedMinhash: one tokenize + one digest pass in the optimized plan") {
    val plan = Dedup
      .bandedMinhash(rangeDocs("a b c d e f g h "), "text", k = 5,
        numHashes = 8, bands = 4, keep = Seq("doc_id"))
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).length
    val md5s = "md5\\(".r.findAllIn(plan).length
    assert(splits == 1, s"expected 1 split, found $splits:\n$plan")
    // one digest per shingle TOTAL — numHashes functions derive from it
    // by integer double hashing; and the short-doc filter must sit above
    // the Generate (a pushed filter would inline the whole pipeline)
    assert(md5s == 1, s"expected 1 md5, found $md5s:\n$plan")
  }

  test("contaminationScores: one split per side in the optimized plan") {
    val plan = Decontaminate
      .contaminationScores(rangeDocs("a b c d "), rangeDocs("c d e f "), n = 2)
      .queryExecution.optimizedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).length
    assert(splits == 2, s"expected 2 splits (train+eval), found $splits:\n$plan")
  }
}
