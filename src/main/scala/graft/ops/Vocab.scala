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
}
