package graft.props

import graft.SparkTestBase
import graft.ops.TextStats
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the HOF-based repetition signals equal a brute-force
  * Scala model on random multi-line documents (duplicate-heavy line pools
  * so the dup fractions are exercised, not vacuously zero). All docs of a
  * sample are batched into ONE DataFrame so the property costs one Spark
  * job per case, not one per doc.
  */
class RepetitionPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def checkProp(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // small line pool => real duplicates; includes the empty line
  private val lineGen: Gen[String] = Gen.oneOf(
    "", "aa", "bbbb", "line one", "x", "longer line with words",
    "aa", "line one") // repeats raise duplicate probability
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, lineGen))
      .map(_.mkString("\n"))

  private case class Model(nLines: Int, dupFrac: Double, dupCharFrac: Double)

  private def model(text: String): Model = {
    // Spark split("\n") keeps trailing empty strings (Java limit -1)
    val lines = text.split("\n", -1)
    val n = lines.length
    val byLine = lines.groupBy(identity).map { case (l, occ) =>
      (l, occ.length) }
    val nDistinct = byLine.size
    val dupChars = byLine.iterator
      .map { case (l, c) => (c - 1).toLong * l.length }.sum
    val totChars = lines.iterator.map(_.length.toLong).sum
    Model(n,
      (n - nDistinct).toDouble / math.max(n, 1),
      dupChars.toDouble / math.max(totChars, 1L))
  }

  test("dup-line fractions == brute-force model on random multiline docs") {
    checkProp("rep-model", Prop.forAllNoShrink(
      Gen.listOfN(20, docGen)) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextStats.repetitionSignals(df)
        .select("doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac")
        .as[(Long, Int, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      docs.zipWithIndex.forall { case (t, i) =>
        val m = model(t)
        val (_, n, df1, df2) = got(i.toLong)
        n == m.nLines && df1 == m.dupFrac && df2 == m.dupCharFrac
      }
    })
  }
}
