package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** FuzzyJoin — edit-distance-1 dictionary join via deletion
  * neighborhoods + exact levenshtein residual.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def join(probes: Seq[Option[String]], watch: Seq[Option[String]],
      maxLen: Int = FuzzyJoin.DefaultMaxLen) =
    FuzzyJoin.editDistance1Join(
      probes.toDF("s"), "s", watch.toDF("s"), "s", maxLen)
      .as[(String, String, Int)].collect().toSet

  /** Brute-force reference: full cross product + classic DP levenshtein
    * (independent implementation — no Spark).
    */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
  private def brute(probes: Seq[String], watch: Seq[String]) =
    (for {
      p <- probes.distinct; w <- watch.distinct
      d = lev(p, w) if d <= 1
    } yield (p, w, d)).toSet

  test("substitution, insertion, deletion, exact, and non-matches — " +
    "equal to the brute-force cross product") {
    val watch = Seq("brand0.com", "brand1.com", "evil.net")
    val probes = Seq(
      "brand0.com",   // exact
      "brend0.com",   // substitution
      "brnd0.com",    // deletion
      "brannd0.com",  // insertion
      "brand0.net",   // distance 2 from brand0.com? (m->n, co->ne...) far
      "unrelated.org",
      "evil.net", "evil1.net", "vil.net")
    val got = join(probes.map(Some(_)), watch.map(Some(_)))
    assert(got == brute(probes, watch))
    assert(got.contains(("brand0.com", "brand1.com", 1))) // cross-brand
    assert(got.contains(("brand0.com", "brand0.com", 0)))
    assert(!got.exists(_._1 == "unrelated.org"))
  }

  test("property: random-ish token soup matches brute force exactly") {
    // deterministic pseudo-random strings (no Math.random in tests that
    // feed assertions — reproducibility rule)
    val alphabet = "abc"
    def mk(seed: Long, len: Int): String =
      (0 until len).map(i =>
        alphabet(((seed * 31 + i * 17) % 3).toInt.abs)).mkString
    val probes = (0 until 60).map(i => mk(i, 2 + (i % 4)))
    val watch = (0 until 20).map(i => mk(i * 7 + 3, 2 + (i % 3)))
    assert(join(probes.map(Some(_)), watch.map(Some(_))) ==
      brute(probes, watch))
  }

  test("NULLs never match; empty string matches 1-char strings") {
    val got = join(Seq(Some(""), None, Some("a")),
      Seq(Some("b"), None, Some("")))
    assert(got == Set(("", "b", 1), ("", "", 0), ("a", "b", 1),
      ("a", "", 1)))
  }

  test("values past maxLen degrade to exact-only (bounded broadcast)") {
    val long = "x" * 80
    val longTypo = "y" + ("x" * 79)
    val got = join(Seq(Some(long), Some(longTypo)), Seq(Some(long)),
      maxLen = 64)
    // exact long self-match survives; the dist-1 long pair is skipped
    assert(got == Set((long, long, 0)))
  }

  test("duplicate probe rows collapse to distinct value pairs, and " +
    "multi-variant overlap does not double-report a pair") {
    val got = join(Seq(Some("ab"), Some("ab"), Some("ab")),
      Seq(Some("ab")))
    assert(got == Set(("ab", "ab", 0)))
  }

  test("plan: watch side broadcast, no cartesian/nested-loop join") {
    val plan = FuzzyJoin.editDistance1Join(
      Seq("aa", "bb").toDF("s"), "s", Seq("aa").toDF("s"), "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
