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
  * 100 TB shape: quality is map-side over the corpus scan; near-dup is the
  * banded + `maxBandDf`-capped pair generator plus O(log diameter)
  * pointer-jumping rounds; decontamination broadcasts the benchmark-sized
  * eval gram set so the corpus never shuffles for it. The composition
  * itself adds only doc_id-keyed joins of doc-sized verdict tables —
  * co-partitioned on the same key, no new corpus-sized shuffle.
  */
object Curation {

  /** One row per document in `docs`: `doc_id`, `cluster_id` (near-dup
    * component label, = own doc_id for singletons), `shared_ngrams`
    * (distinct word `contamN`-grams shared with `evalDocs`, 0 when none),
    * `drop_stage` (`quality:<rule>` | `near_dup` | `contaminated`, null
    * when kept) and `keep`.
    *
    * Quality thresholds mirror [[TextStats.qualityFilter]]; near-dup
    * parameters mirror [[Dedup.minhashLshPairs]] (including the
    * `maxBandDf` skew cap); `contamN`/`minShared` mirror
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
      k: Int = 5, numHashes: Int = 8, bands: Int = 4, maxBandDf: Int = 0,
      contamN: Int = 13, minShared: Long = 1,
      textCol: String = "text"): DataFrame = {
    val quality = TextStats
      .qualityFilter(docs, textCol, minTokens, maxTokens, minMeanTokenLen,
        maxMeanTokenLen, minAlnumRatio, minStopwordHits)
      .select(col("doc_id"), col("fail_reason").as("quality_fail"))
    // the dedup family hardcodes a "text" column — honor textCol for it too
    val dedupDocs = docs.select(col("doc_id"), col(textCol).as("text"))
    val clusters = Dedup.nearDupClusters(dedupDocs,
      Dedup.minhashLshPairs(dedupDocs, k, numHashes, bands, maxBandDf))
    val contam = Decontaminate
      .contaminationScores(docs, evalDocs, contamN, textCol)
    // quality is exactly one row per input doc, so it anchors the chain
    quality
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
  }
}
