package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic hash-based splitting/downsampling (Sampling). */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("assignSplits: growth-stable — old docs keep their split exactly") {
    val small = spark.range(0, 500).select(col("id").as("doc_id"))
    val big = spark.range(0, 2000).select(col("id").as("doc_id"))
    val a = Sampling.assignSplits(small, splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplits(big, splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("assignSplits: proportions near weights, every split non-empty") {
    val docs = spark.range(0, 4000).select(col("id").as("doc_id"))
    val counts = Sampling.assignSplits(docs, splits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 4000L)
    assert(math.abs(counts("train") / 4000.0 - 0.8) < 0.03)
    assert(math.abs(counts("val") / 4000.0 - 0.1) < 0.02)
    assert(math.abs(counts("test") / 4000.0 - 0.1) < 0.02)
  }

  test("assignSplits: rejects weights that do not sum to 1") {
    val docs = spark.range(0, 1).select(col("id").as("doc_id"))
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("sample: deterministic, growth-stable, rate edges") {
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"))
    val kept = Sampling.sample(docs, 0.25).select("doc_id")
      .as[Long].collect().toSet
    assert(math.abs(kept.size / 2000.0 - 0.25) < 0.04)
    // same survivors within the smaller prefix corpus
    val keptSmall = Sampling
      .sample(spark.range(0, 700).select(col("id").as("doc_id")), 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(keptSmall == kept.filter(_ < 700))
    assert(Sampling.sample(docs, 1.0).count() == 2000L)
    assert(Sampling.sample(docs, 0.0).count() == 0L)
  }

  test("sample: different salts draw independently of split assignment") {
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"))
    val trainIds = Sampling.assignSplits(docs, splits)
      .where(col("split") === "train").select("doc_id").as[Long]
      .collect().toSet
    val kept = Sampling.sample(docs, 0.25, salt = "s1").select("doc_id")
      .as[Long].collect().toSet
    // if draws were coupled, the sampled set would concentrate inside one
    // split; expect roughly 80% of survivors in train (loose bound)
    val frac = kept.count(trainIds.contains).toDouble / kept.size
    assert(frac > 0.7 && frac < 0.9, s"coupled draws? train frac $frac")
  }

  test("capPerKey: quota bites hot keys only, membership is hash-ranked " +
    "and deterministic") {
    // key "hot" gets 60 docs, "cold" 5 — quota 10 cuts hot to 10, keeps
    // cold whole
    val docs = spark.range(0, 65).select(col("id").as("doc_id"),
      when(col("id") < 60, "hot").otherwise("cold").as("k"))
    val kept = Sampling.capPerKey(docs, "k", maxPerKey = 10, salt = "d1")
      .select("doc_id", "k").as[(Long, String)].collect()
    val byKey = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byKey("cold") == (60L until 65L).toSet, "below-quota key cut")
    assert(byKey("hot").size == 10)
    // the kept hot docs are EXACTLY the 10 smallest by hash point — the
    // independent model re-ranks driver-side with the same md5 derivation
    val md = java.security.MessageDigest.getInstance("MD5")
    def hp(id: Long): Long = {
      val hex = md.digest(s"d1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val expected = (0L until 60L).sortBy(id => (hp(id), id)).take(10).toSet
    assert(byKey("hot") == expected)
    // re-running yields the identical set (no RNG state)
    val again = Sampling.capPerKey(docs, "k", maxPerKey = 10, salt = "d1")
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    // a different salt picks a different (still size-10) hot subset
    val other = Sampling.capPerKey(docs, "k", maxPerKey = 10, salt = "d2")
      .where(col("k") === "hot").select("doc_id").as[Long].collect().toSet
    assert(other.size == 10 && other != byKey("hot"))
  }

  test("capPerKey: null keys conflate to one shared quota; null IDS are " +
    "dropped (no hash point => no reproducible rank); maxPerKey >= 1 " +
    "enforced") {
    val docs = Seq((1L, Some("a")), (2L, None), (3L, None), (4L, None))
      .toDF("doc_id", "k")
    val kept = Sampling.capPerKey(docs, "k", maxPerKey = 2, salt = "d1")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size == 3 && kept.contains(1L),
      s"null group must keep exactly 2 of its 3 docs: $kept")
    // null-ID rows tie on BOTH sort keys — an arbitrary physical-order
    // subset would survive; the consistent verdict is sample's (dropped)
    val withNullIds = Seq((Some(1L), "a"), (None, "a"), (None, "a"))
      .toDF("doc_id", "k")
    val keptIds = Sampling.capPerKey(withNullIds, "k", maxPerKey = 2)
      .select("doc_id").collect().map(r => r.isNullAt(0)).toSeq
    assert(keptIds == Seq(false), "null-id rows must be dropped, not " +
      s"arbitrarily ranked: $keptIds")
    intercept[IllegalArgumentException] {
      Sampling.capPerKey(docs, "k", maxPerKey = 0)
    }
  }

  test("null ids: NULL split from assignSplits, dropped by sample — " +
    "consistent verdicts (round-5 find)") {
    val docs = Seq(Some(1L), None, Some(2L)).toDF("doc_id")
    val assigned = Sampling.assignSplits(docs, splits).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        Option(r.getString(1))).toMap
    assert(assigned(None).isEmpty,
      "a null id must get a NULL split, never the last declared one")
    assert(assigned(Some(1L)).nonEmpty && assigned(Some(2L)).nonEmpty)
    // sample keeps everything at rate 1.0 EXCEPT null ids (no hash point)
    assert(Sampling.sample(docs, 1.0).count() == 2L)
  }

  test("stratifiedSample: per-stratum keep sets EQUAL the single-rate " +
    "sample of that stratum (same salt) — independence by construction") {
    val docs = (0L until 400L)
      .map(i => (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
      .toDF("doc_id", "lang")
    val got = Sampling.stratifiedSample(docs, "lang",
      Seq("en" -> 0.25, "de" -> 1.0), defaultRate = 0.0, salt = "s7")
      .select("doc_id", "lang").as[(Long, String)].collect().toSeq
    val byLang = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    import org.apache.spark.sql.functions.col
    def plain(lang: String, rate: Double): Set[Long] =
      Sampling.sample(docs.where(col("lang") === lang), rate, salt = "s7")
        .select("doc_id").as[Long].collect().toSet
    assert(byLang("en") == plain("en", 0.25))
    assert(byLang("de") == plain("de", 1.0) && byLang("de").size == 100)
    assert(!byLang.contains("fr"), "undeclared stratum must take " +
      "defaultRate 0.0")
  }

  test("weightedSample: keep probability min(1, w*rate) — weight >= 1/rate " +
    "always keeps, weight 0 / negative / NULL never keep, growth-stable") {
    val docs = (0L until 300L).map(i => (i,
      if (i % 3 == 0) 10.0 else if (i % 3 == 1) 0.4 else 0.0))
      .toDF("doc_id", "w")
    val kept = Sampling.weightedSample(docs, "w", rate = 0.5, salt = "wt")
      .select("doc_id").as[Long].collect().toSet
    // w=10, rate 0.5 -> clamp at 1.0: ALL 100 kept
    assert((0L until 300L by 3).forall(kept.contains))
    // w=0: never kept
    assert((2L until 300L by 3).forall(!kept.contains(_)))
    // w=0.4 -> prob 0.2: some but not all; equals the plain sample at 0.2
    val partial = kept.filter(_ % 3 == 1)
    val expect = Sampling.sample(
      docs.where(col("doc_id") % 3 === 1), rate = 0.2, salt = "wt")
      .select("doc_id").as[Long].collect().toSet
    assert(partial == expect && partial.nonEmpty && partial.size < 100)
    // NULL / negative weights never keep
    val edge = Seq((1L, Some(-1.0)), (2L, Option.empty[Double]),
      (3L, Some(5.0))).toDF("doc_id", "w")
    assert(Sampling.weightedSample(edge, "w", 1.0)
      .select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("stratifiedSample: NULL strata take defaultRate; null ids never " +
    "kept; duplicate strata rejected") {
    val docs = Seq((Some(1L), Some("en")), (Some(2L), None),
      (None, Some("en"))).toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(docs, "lang",
      Seq("en" -> 1.0), defaultRate = 1.0)
      .select("doc_id").collect().map(r => r.isNullAt(0)).toSeq
    assert(kept == Seq(false, false),
      s"null stratum keeps via defaultRate, null id never keeps: $kept")
    assert(Sampling.stratifiedSample(docs, "lang", Seq("en" -> 1.0),
      defaultRate = 0.0).count() == 1L)
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(docs, "lang",
        Seq("en" -> 0.5, "en" -> 0.7)))
  }

  test("budgetPerKey: longest hash-order prefix whose inclusive token " +
    "sum fits; model-checked against a driver-side re-rank") {
    val docs = (0 until 60).map(i =>
      (s"doc$i", s"key${i % 3}", (i % 7 + 2).toLong))
      .toDF("doc_id", "key", "n_tokens")
    val budget = 30L
    val got = Sampling.budgetPerKey(docs, "key", budget, salt = "b1")
      .select("doc_id", "key", "cum_tokens")
      .as[(String, String, Long)].collect().toSeq.sortBy(_._1)
    // independent model: md5 hash-point order per key, inclusive cumsum
    def hp(id: String): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"b1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      BigInt(hex.take(15), 16)
    }
    val expected = (0 until 60).map(i =>
      (s"doc$i", s"key${i % 3}", (i % 7 + 2).toLong))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(r => (hp(r._1), r._1)).flatMap { r =>
          cum += r._3
          if (cum <= budget) Some((r._1, r._2, cum)) else None
        }
      }.sortBy(_._1)
    assert(got == expected)
    // every key hit the boundary (the fixture carries ~3x the budget)
    assert(got.groupBy(_._2).values.forall(_.map(_._3).max > budget - 9))
  }

  test("budgetPerKey: strict budget (an oversized first doc empties its " +
    "group), NULL ids dropped, NULL/negative token counts cost 0") {
    val docs = Seq(
      (Some("a"), "k1", Some(100L)), // alone over budget in hash order?
      (Option.empty[String], "k2", Some(1L)), // null id -> dropped
      (Some("b"), "k2", Option.empty[Long]), // null tokens -> 0
      (Some("c"), "k2", Some(-5L)), // negative -> 0
      (Some("d"), "k2", Some(10L)))
      .toDF("doc_id", "key", "n_tokens")
    val got = Sampling.budgetPerKey(docs, "key", budget = 10L)
      .select("doc_id", "cum_tokens")
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    // k1's only doc exceeds the budget alone -> zero k1 rows; all k2
    // survivors fit (0 + 0 + 10 in any hash order <= 10)
    assert(got.map(_._1) == Seq("b", "c", "d"))
    assert(got.map(_._2).max == 10L)
  }

  test("budgetPerKey: cum_tokens clash rejected; same plan family as " +
    "capPerKey (one exchange)") {
    val bad = Seq(("a", "k", 1L, 2L))
      .toDF("doc_id", "key", "n_tokens", "cum_tokens")
    intercept[IllegalArgumentException](
      Sampling.budgetPerKey(bad, "key", 5L))
    val plan = Sampling.budgetPerKey(
      Seq(("a", "k", 1L)).toDF("doc_id", "key", "n_tokens"), "key", 5L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"one key exchange expected:\n$plan")
  }

}
