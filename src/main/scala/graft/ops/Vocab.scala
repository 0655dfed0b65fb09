package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary-induction primitives — the corpus statistics a tokenizer
  * TRAINING run needs. The headline op is the first step of byte-pair
  * encoding (Sennrich et al. 2016): count every adjacent character pair
  * inside every word, frequency-weighted — the pair with the highest
  * total is BPE's first merge, and iterating (merge, recount) yields
  * the merge table. One distributed recount is the expensive primitive;
  * the merge loop itself is a driver-side fold over these tables.
  *
  * The 100 TB structure is the point: the CORPUS is touched exactly
  * once, by the word-count aggregate (one shuffle, map-side partial —
  * word frequency is the classic combiner-friendly aggregate). The
  * character-pair sweep then runs over the DISTINCT-WORD table — the
  * vocabulary, typically 10^6-10^8 rows regardless of corpus size — so
  * each BPE iteration after the first costs vocabulary work, not corpus
  * work. This two-level factorization (corpus → weighted vocab → pair
  * counts) is exactly why BPE training is feasible at web scale.
  *
  * Pairs are strictly INSIDE words (the GPT-2-family convention: the
  * word boundary is a hard merge barrier, no end-of-word sentinel);
  * single-character words contribute nothing. Characters are engine
  * code points via `substring` — both engines index characters, not
  * bytes; the shared tokenizer has already lowercased. The final rank
  * is fully tie-broken (total DESC, pair ASC) so top-k is a total
  * deterministic function of the corpus.
  *
  * NULL ids / texts are dropped (the corpus-wide rule). The rank window
  * is global but runs over the pair-count table, which is bounded by
  * the corpus's distinct character-bigram count (≤ |charset|²), never
  * by data volume — the [[Rollups.topKPerGroup]] aggregate-then-rank
  * shape.
  */
object Vocab {

  /** Frequency-weighted word counts: `(word, freq)` — the staging table
    * every BPE iteration reuses. One corpus shuffle.
    */
  def wordCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(explode(Decontaminate.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Top-k adjacent character pairs by frequency-weighted count —
    * BPE merge candidates: `(pair, total, rank)`, rank 1 = the merge.
    */
  def bpeMergeCounts(docs: DataFrame, topK: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val pairs = wordCounts(docs, idCol, textCol)
      .where(length(col("word")) >= 2)
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(expr("substring(word, i, 2)").as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("total"))
    pairs
      .withColumn("rank", row_number().over(
        Window.orderBy(col("total").desc, col("pair").asc)))
      .where(col("rank") <= topK)
      .select("pair", "total", "rank")
  }

  /** Vocabulary COVERAGE / out-of-vocabulary audit — per group, what
    * share of word occurrences a top-`vocabSize` frequency vocabulary
    * fails to cover. This is the number that decides whether a
    * tokenizer/vocab trained on yesterday's mix still fits today's
    * (a lang or source whose oov_permille spikes is drifting away from
    * the vocabulary), and the per-group view is the point: a healthy
    * corpus-wide average routinely hides one minority language at 40%
    * OOV.
    *
    * Vocabulary = top-`vocabSize` words by (freq DESC, word ASC) over
    * the WHOLE corpus ([[Ranked.rankedTopK]] — deterministic under
    * ties), then BROADCAST against the exploded token stream: the
    * corpus-side join is a scan + hash probe, no shuffle beyond the
    * final per-group fold. Two corpus passes total (vocab build +
    * measure) — at scale the vocab is built once and reused across
    * measurement runs, which is why the two stages are separable ops.
    * `n_oov_types` (distinct uncovered words) separates "one hot
    * unknown word" from "a thousand scattered ones" — same count,
    * opposite fixes.
    */
  def oovRate(docs: DataFrame, vocabSize: Int, groupCols: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(groupCols.nonEmpty, "at least one group column")
    val vocab = Ranked.rankedTopK(wordCounts(docs, idCol, textCol),
      Seq(col("freq").desc, col("word").asc), vocabSize, "__graft_r")
      .select(col("word").as("__graft_vw"))
    docs.where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(groupCols.map(col) :+
        explode(Decontaminate.tokens(col(textCol))).as("__graft_w"): _*)
      .join(broadcast(vocab),
        col("__graft_w") === col("__graft_vw"), "left")
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__graft_vw").isNull, 1L).otherwise(0L))
          .as("n_oov"),
        countDistinct(when(col("__graft_vw").isNull, col("__graft_w")))
          .as("n_oov_types"))
      .withColumn("oov_permille", expr("n_oov * 1000 div n_tokens"))
  }
}
