package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation AUDIT: the composed form of the published
  * training-data pipeline — content-quality rules (Gopher, Rae et al.
  * 2021), near-dup clustering (MinHash-LSH banding + connected components,
  * keep = cluster canonical), and benchmark decontamination (shared word
  * n-grams vs an eval set) — one row per input document with the keep/drop
  * verdict and the first failing stage named.
  *
  * Stages are graded INDEPENDENTLY over the full corpus (audit form):
  * every document receives every verdict, so drop reasons are attributable
  * and per-stage drop rates can be read off one table. A production run
  * that only wants the keep SET can cascade stages to save compute; for
  * documents this audit keeps, the cascade agrees (keep = all three pass).
  * `drop_stage` precedence for multi-fail documents: quality first (the
  * cheapest check a cascade would run first), then near_dup, then
  * contaminated.
  *
  * 100 TB shape (round-5 single-tokenization rework): the corpus is read
  * and tokenized EXACTLY ONCE — one pass stages (doc_id, quality verdict,
  * token array) into a localCheckpoint (the "tokens table" a production
  * pipeline would materialize to parquet; swap the checkpoint for a real
  * table write at cluster scale). Everything downstream derives from the
  * staged table: quality is already a column; minhash shingles + the md5
  * signature sweep run once into a checkpointed band table (so the band
  * self-join does not recompute the sweep per side); contamination grams
  * probe a broadcast eval gram set, so the corpus never shuffles for it.
  * Near-dup is the `maxBandDf`-capped pair generator plus O(log diameter)
  * pointer-jumping rounds. The composition itself adds only doc_id-keyed
  * joins of doc-sized verdict tables; the final (doc-sized, 5-column)
  * verdict table is materialized so every staged checkpoint can be
  * released before returning.
  */
object Curation {

  /** One row per document in `docs`: `doc_id`, `cluster_id` (near-dup
    * component label, = own doc_id for singletons), `shared_ngrams`
    * (distinct word `contamN`-grams shared with `evalDocs`, 0 when none),
    * `drop_stage` (`quality:<rule>` | `near_dup` | `contaminated`, null
    * when kept) and `keep`.
    *
    * Quality thresholds mirror [[TextStats.qualityFilter]] (shared
    * [[TextStats.failReasonExpr]] rule cascade; the token count comes from
    * the staged token array — identical to `tokenCount`, lowercasing never
    * changes whitespace splits); near-dup parameters mirror
    * [[Dedup.minhashLshPairs]] (including the `maxBandDf` skew cap, ON by
    * default); `contamN`/`minShared` mirror
    * [[Decontaminate.contaminationScores]].
    *
    * Blind spot to keep configured away: documents with fewer than `k`
    * tokens have no word-k-gram shingles and can never receive a
    * `near_dup` verdict (even exact duplicates). With the defaults
    * (minTokens = 25 >= k = 5) every such document already fails quality,
    * which takes precedence; if you lower minTokens below k, pair this
    * audit with [[Dedup.exact]] for the short tail.
    */
  def curate(docs: DataFrame, evalDocs: DataFrame,
      minTokens: Long = 25, maxTokens: Long = 100000,
      minMeanTokenLen: Double = 3.0, maxMeanTokenLen: Double = 10.0,
      minAlnumRatio: Double = 0.6, minStopwordHits: Long = 1,
      k: Int = 5, numHashes: Int = 8, bands: Int = 4,
      maxBandDf: Int = Dedup.DefaultMaxBandDf,
      contamN: Int = 13, minShared: Long = 1,
      textCol: String = "text"): DataFrame = {
    // --- THE single corpus pass: tokenize once, grade quality in the same
    // projection, checkpoint (doc_id, quality_fail, toks)
    val nToks = TextStats.nTokensOfStaged(col("toks"))
    val staged0 = docs
      .select(col("doc_id"), col(textCol).as("__text"),
        Decontaminate.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        // feature formulas come from TextStats (the single source shared
        // with qualityFeatures/qualityFilter) so the two paths cannot
        // drift — only the token count derives from the STAGED array here
        TextStats.failReasonExpr(
          nTokens = nToks,
          meanTokenLen = TextStats.meanTokenLenExpr(col("__text"), nToks),
          alnumRatio = TextStats.alnumRatioExpr(col("__text")),
          stopwordHits = TextStats.stopwordHits(col("__text")),
          minTokens, maxTokens, minMeanTokenLen, maxMeanTokenLen,
          minAlnumRatio, minStopwordHits).as("quality_fail"),
        col("toks"))
    val stagedT = Staging.stage(staged0, "curate-staged")
    // --- banding: shingles + md5 signature sweep ONCE into a small
    // checkpointed (doc_id, band_idx, band_key) table; the pair self-join
    // and CC then never recompute the sweep
    val banded = Staging.stage(Dedup
      .bandedMinhashOfTokens(stagedT, "toks", k, numHashes, bands,
        keep = Seq("doc_id")), "curate-banded")
    val clusters = Dedup.nearDupClusters(stagedT.select("doc_id"),
      Dedup.pairsFromBanded(banded, maxBandDf))
    // --- decontamination: eval grams BROADCAST (benchmark-sized), train
    // grams derived from the staged tokens — the corpus never shuffles
    val evalGrams = evalDocs
      .select(Decontaminate.tokens(col(textCol)).as("__etoks"))
      .select(explode(
        Decontaminate.ngramsOfTokens(col("__etoks"), contamN)).as("gram"))
      .distinct()
    val contam = stagedT
      .select(col("doc_id"),
        explode(Decontaminate.ngramsOfTokens(col("toks"), contamN))
          .as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("shared_ngrams"))
    // quality is exactly one row per input doc, so it anchors the chain
    val out0 = stagedT.select("doc_id", "quality_fail")
      .join(clusters, Seq("doc_id"))
      .join(contam, Seq("doc_id"), "left")
      .withColumn("shared_ngrams", coalesce(col("shared_ngrams"), lit(0L)))
      .withColumn("drop_stage",
        when(col("quality_fail").isNotNull,
          concat(lit("quality:"), col("quality_fail")))
          .when(!col("is_canonical"), lit("near_dup"))
          .when(col("shared_ngrams") >= minShared, lit("contaminated")))
      .withColumn("keep", col("drop_stage").isNull)
      .select("doc_id", "cluster_id", "shared_ngrams", "drop_stage", "keep")
    // materialize the doc-sized verdict table so the token/band staging
    // blocks can be released NOW instead of pinning corpus-sized state
    // until the caller's action completes
    val out = Staging.stage(out0, "curate-out")
    Staging.release(banded)
    Staging.release(stagedT)
    // the CC label table is a live checkpoint BEHIND the clusters
    // projection (nearDupClusters' final round) — one long per document,
    // corpus-cardinality at scale; release it deeply now that `out` is
    // materialized (round-5 review find: the docstring promised every
    // staged checkpoint released, but this one had no direct handle)
    Staging.releaseDeep(clusters)
    out
  }
}
