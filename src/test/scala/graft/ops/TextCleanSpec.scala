package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** TextClean — control stripping + whitespace normal form. */
class TextCleanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(docs: Seq[(String, String)]) =
    TextClean.normalize(docs.toDF("doc_id", "text"))
      .as[(String, String, Option[Int], Option[Int], Option[Int])]
      .collect().toSeq.sortBy(_._1)

  test("controls stripped (keeping tab/newline/cr as whitespace), runs " +
    "collapsed, ends trimmed, counts exact") {
    val dirty = "  helloworld\t\tnext\r\n line  "
    val got = run(Seq(("a", dirty)))
    assert(got == Seq(("a", "helloworld next line",
      Some(dirty.length), Some(20), Some(3))))
  }

  test("token-sequence invariance on control-free text: cleaning never " +
    "changes what the shared tokenizer sees") {
    val texts = Seq("  a  b\tc \r\n d ", "one two", " x ", "\t\t")
    texts.zipWithIndex.foreach { case (t, i) =>
      val df = Seq((s"d$i", t)).toDF("doc_id", "text")
      val before = df.select(Decontaminate.tokens(
        org.apache.spark.sql.functions.col("text"))).as[Seq[String]].head()
      val after = TextClean.normalize(df).select(Decontaminate.tokens(
        org.apache.spark.sql.functions.col("clean_text")))
        .as[Seq[String]].head()
      assert(before == after, s"text=<$t>")
    }
  }

  test("NULL text passes through (NULL clean + NULL diagnostics); NULL " +
    "id dropped; plan is exchange-free") {
    val got = run(Seq(("a", null), (null, "x")))
    assert(got == Seq(("a", null, None, None, None)))
    val plan = TextClean.normalize(Seq(("a", "x")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
