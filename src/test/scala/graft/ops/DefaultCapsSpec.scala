package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 directive: the 100 TB skew guards default ON — a DEFAULT
  * invocation of any banded/bucketed pair generator must carry the cap
  * window in its plan (never the uncapped quadratic path), and 0 must be
  * the explicit opt-out that removes it.
  */
class DefaultCapsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** The cap is a row_number window over the bucket key filtered on the
    * `bpos` alias — its presence in the optimized plan is the "default is
    * capped" proof.
    */
  private def hasCapWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("bpos")

  private lazy val flood = (0L until 600L)
    .map(i => (i, "identical flood document body repeated verbatim for caps"))
    .toDF("doc_id", "text")

  private lazy val vecFlood = (0L until 60L)
    .map(i => (i, Array(1.0f, 0.5f, 0.25f, 0.125f)))
    .toDF("vec_id", "embedding")

  test("minhash LSH pairs: default plan is capped; 0 opts out") {
    assert(hasCapWindow(Dedup.minhashLshPairs(flood)))
    assert(!hasCapWindow(Dedup.minhashLshPairs(flood, maxBandDf = 0)))
    // functional: 600 identical docs — the default cap bounds the flood at
    // <= n x cap pairs, strictly below the n^2/2 uncapped explosion
    val capped = Dedup.minhashLshPairs(flood).count()
    val uncapped = Dedup.minhashLshPairs(flood, maxBandDf = 0).count()
    assert(uncapped == 600L * 599 / 2)
    assert(capped < uncapped)
    assert(capped <= 600L * Dedup.DefaultMaxBandDf)
  }

  test("simhash near-dup pairs: default plan is capped; 0 opts out") {
    assert(hasCapWindow(Dedup.simhashNearDupPairs(flood)))
    assert(!hasCapWindow(Dedup.simhashNearDupPairs(flood, maxBandDf = 0)))
  }

  test("ngram jaccard: default excludes hot shingles; 0 opts out") {
    // the df-cap guard is a join against the shingle-df table, not a
    // window — assert the default plan carries the df filter aggregate
    val dflt = Dedup.ngramJaccardPairs(flood, minJaccard = 0.1)
    val off = Dedup.ngramJaccardPairs(flood, minJaccard = 0.1,
      maxShingleDf = 0)
    // the guard adds a shingle-df aggregate + semi-join stage to the plan
    assert(dflt.queryExecution.optimizedPlan.toString !=
      off.queryExecution.optimizedPlan.toString)
    // every shingle of the 600-identical flood has df=600 > any sane cap
    // ... but 600 < DefaultMaxShingleDf, so the default must NOT drop them
    assert(dflt.count() == off.count())
    // an explicit tighter cap does drop them (guard actually wired)
    assert(Dedup.ngramJaccardPairs(flood, minJaccard = 0.1,
      maxShingleDf = 10).count() == 0)
  }

  test("LSH / IVF top-k and embedding pairs: default plans are capped") {
    assert(hasCapWindow(Similarity.lshTopK(vecFlood, k = 2)))
    assert(!hasCapWindow(
      Similarity.lshTopK(vecFlood, k = 2, maxBucketSize = 0)))
    assert(hasCapWindow(Similarity.ivfTopK(vecFlood, k = 2, nlist = 4)))
    assert(hasCapWindow(Dedup.embeddingCosinePairs(vecFlood, 0.5)))
    assert(!hasCapWindow(
      Dedup.embeddingCosinePairs(vecFlood, 0.5, maxBucketSize = 0)))
    // identical-vector flood: one bucket; default cap keeps every vector
    // reachable as vec_b (coverage), bounds the pair fanout
    val pairs = Dedup.embeddingCosinePairs(vecFlood, 0.99,
      maxBucketSize = 8).count()
    assert(pairs == (8L * 59) - (8L * 7 / 2)) // first 8 pair with all later
  }

  test("AutoCap resolves relative to corpus size: a healthy uniform " +
      "corpus is never truncated (round-5 review find)") {
    import Similarity.{AutoCap, resolveCap}
    // floor dominates for small corpora
    assert(resolveCap(AutoCap, 1024, 64, 1000L) == 1024)
    // large corpus: 8x the ceil-average bucket load — the expected value
    // is an INDEPENDENT hand-derived constant (ceil(200000/64) = 3125
    // exactly, x8 = 25000), not the implementation's formula re-spelled
    // (round-5 test-review find: the textual formula drifted with any
    // shared mistake)
    assert(resolveCap(AutoCap, 1024, 64, 200000L) == 25000)
    // a non-dividing corpus rounds UP: ceil(200001/64) = 3126, x8 = 25008
    assert(resolveCap(AutoCap, 1024, 64, 200001L) == 25008)
    // explicit opt-out and absolute caps pass through untouched
    assert(resolveCap(0, 1024, 64, 1000000L) == 0)
    assert(resolveCap(50, 1024, 64, 1000000L) == 50)

    // functional: 3000 DISTINCT vectors over 2 hyperplane buckets
    // (~1500 each > the old fixed 1024). The default invocation must be
    // EXACT within bucket (equal to the uncapped form); the old fixed cap
    // demonstrably truncates.
    val uniform = (0L until 3000L)
      .map(i => (i, Array(
        math.cos(i * 0.01).toFloat, math.sin(i * 0.013).toFloat,
        math.cos(i * 0.007).toFloat, math.sin(i * 0.003).toFloat)))
      .toDF("vec_id", "embedding")
    def topkRows(cap: Int) =
      Similarity.lshTopK(uniform, k = 2, planes = 1, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
    val auto = Similarity.lshTopK(uniform, k = 2, planes = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = topkRows(0)
    assert(auto == exact, "default (AutoCap) must match the uncapped result")
    assert(topkRows(1024) != exact,
      "fixture failed to demonstrate the fixed-cap truncation")
  }

  test("semDedup: default cap present; capped-out vectors stay keepers") {
    val out = Similarity.semDedup(vecFlood, threshold = 0.99, nlist = 2)
    assert(hasCapWindow(out))
    // coverage invariant: every vector appears EXACTLY once — by id set,
    // not count alone (round-5 test-review find: a join fanning one id out
    // while dropping another kept count() == 60)
    val ids = out.select("vec_id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 60L), s"vec_ids: $ids")
  }
}
