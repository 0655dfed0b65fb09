package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** DgaScore — integer-exact lexical DGA features. */
class DgaScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def score(domains: Seq[String]) =
    DgaScore.score(domains.toDF("domain"), "domain")
      .select("label", "label_len", "n_digits", "n_vowels", "max_run",
        "dga_rules", "dga_suspect")
      .as[(String, Int, Int, Int, Int, Int, Boolean)]
      .collect().toSeq.sortBy(_._1)

  test("word labels score zero rules; hex-noise labels flag") {
    // checkout: len 8, 0 digits, vowels e/o/u = 3 (3*4=12 > 8), runs
    // ch|ck|t max 2 -> 0 rules
    // x7f3k9q2m8p1zw: len 14 (R1), 6 digits (30 >= 14, R2), 0 vowels
    // (R3), runs all length <= 2 -> 3 rules -> suspect
    val got = score(Seq("checkout.example.com", "x7f3k9q2m8p1zw.biz"))
    assert(got == Seq(
      ("checkout", 8, 0, 3, 2, 0, false),
      ("x7f3k9q2m8p1zw", 14, 6, 0, 2, 3, true)))
  }

  test("a consonant smear flags on R3+R4 even without digits or length") {
    // strngthn: len 8, 0 digits, 0 vowels (R3), one unbroken run of 8
    // (R4) -> 2 rules -> suspect at the default threshold
    val got = score(Seq("strngthn.net"))
    assert(got == Seq(("strngthn", 8, 0, 0, 8, 2, true)))
  }

  test("scoring uses the FIRST label only, lowercased") {
    // the registrable part is long/noisy but the first label is clean
    val got = score(Seq("LOGIN.x7f3k9q2m8p1zw.example.com"))
    assert(got == Seq(("login", 5, 0, 2, 1, 0, false)))
  }

  test("NULL domains yield NULL features, zero rules, and never flag") {
    val got = DgaScore.score(
      Seq(Option.empty[String]).toDF("domain"), "domain")
      .select("label", "dga_rules", "dga_suspect")
      .as[(Option[String], Int, Boolean)].collect().toSeq
    // CASE over NULL conditions takes the ELSE branch in both engines:
    // rules 0, never suspect
    assert(got == Seq((None, 0, false)))
  }

  test("degenerate empty label (leading-dot domain) is pinned: R2+R3 " +
    "hold vacuously at length 0, so it flags") {
    val got = score(Seq(".weird.example.com"))
    assert(got == Seq(("", 0, 0, 0, 0, 2, true)))
  }

  test("zero shuffles: the feature pass is pure map-side") {
    val plan = DgaScore.score(Seq("a.b").toDF("domain"), "domain")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "DGA scoring must be map-side:\n" + plan.take(2000))
  }

  test("parameter validation: threshold bounds and output-name clashes") {
    val df = Seq("a.b").toDF("domain")
    intercept[IllegalArgumentException] {
      DgaScore.score(df, "domain", suspectRules = 0)
    }
    intercept[IllegalArgumentException] {
      DgaScore.score(df, "domain", suspectRules = 5)
    }
    intercept[IllegalArgumentException] {
      DgaScore.score(Seq(("a.b", 1)).toDF("domain", "label"), "domain")
    }
  }
}
