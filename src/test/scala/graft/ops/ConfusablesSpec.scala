package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Confusables — leet-skeleton typosquat matching. */
class ConfusablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val watch = Seq("paypal.com", "google.com", "example.org")

  private def hits(probes: Seq[String], excludeExact: Boolean = true) =
    Confusables.matchWatchlist(
      probes.toDF("domain"), "domain", watch.toDF("domain"),
      excludeExact = excludeExact)
      .select("domain", "watch_domain")
      .as[(String, String)].collect().toSeq.sorted

  test("substituted leet characters collapse to the watch skeleton") {
    val got = hits(Seq(
      "paypa1.com", // 1 -> l
      "g00gle.com", // 0 -> o
      "pay-pal.com", // hyphen deleted
      "PAYPA1.COM", // case folds
      "examp1e.org",
      "unrelated.net"))
    assert(got == Seq(
      ("PAYPA1.COM", "paypal.com"),
      ("examp1e.org", "example.org"),
      ("g00gle.com", "google.com"),
      ("pay-pal.com", "paypal.com"),
      ("paypa1.com", "paypal.com")))
  }

  test("multiple substitutions still match (where edit distance fails)") {
    // three substitutions + a hyphen: lev = 4 from the watch entry
    assert(hits(Seq("p@yp-a1.c0m")) == Seq(("p@yp-a1.c0m", "paypal.com")))
  }

  test("exact (case-insensitive) hits are excluded by default, kept on " +
    "demand") {
    assert(hits(Seq("paypal.com", "PayPal.com")) == Nil)
    assert(hits(Seq("paypal.com"), excludeExact = false) ==
      Seq(("paypal.com", "paypal.com")))
  }

  test("NULL probes and NULL watch entries never match") {
    val got = Confusables.matchWatchlist(
      Seq(Option.empty[String], Some("paypa1.com")).toDF("domain"),
      "domain",
      Seq(Option.empty[String], Some("paypal.com")).toDF("domain"))
      .select("domain", "watch_domain")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("paypa1.com", "paypal.com")))
  }

  test("the watch side broadcasts; the probe side never shuffles") {
    val plan = Confusables.matchWatchlist(
      Seq("a.com").toDF("domain"), "domain", watch.toDF("domain"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join:\n${plan.take(2000)}")
    // the only hash exchange allowed is the watchlist dedup, which sits
    // UNDER the BroadcastExchange (the probe subtree prints first)
    val probeSide = plan.substring(0, plan.indexOf("BroadcastExchange"))
    assert(!probeSide.contains("Exchange hashpartitioning"),
      s"probe side must not shuffle:\n${plan.take(2000)}")
  }

  test("skeleton is the documented fixed map") {
    val got = Seq("01358$@!|-7x").toDF("s")
      .select(Confusables.skeleton($"s")).as[String].head()
    assert(got == "olesbsailtx")
  }
}
