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
  }
}
