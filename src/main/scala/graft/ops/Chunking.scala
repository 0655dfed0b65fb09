package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding token-window chunking — the context-window assembly step
  * between a curated corpus and a training run: split each document into
  * windows of at most `chunkTokens` whitespace tokens starting every
  * `stride` tokens, so long documents become overlapping training
  * examples instead of being truncated (stride < chunk) or tiled
  * exactly (stride = chunk).
  *
  * The window rule, stated once: chunk starts are 0, stride, 2·stride, …
  * for every start < n_tokens; each chunk is
  * `tokens[start, min(start + chunkTokens, n))` — the final chunk may be
  * short, and a document with n ≤ chunkTokens yields exactly one chunk.
  * `stride ≤ chunkTokens` is required: a larger stride silently DROPS
  * tokens between windows, which is sampling, not chunking — callers
  * wanting that compose a sampler.
  *
  * Tokenizer = [[Decontaminate.tokens]] — the ONE corpus-wide definition
  * of "word" (minhash, contamination, TF-IDF, the inverted index, and
  * chunking must agree on token boundaries or a decontaminated span can
  * leak back in through a chunk boundary).
  *
  * 100 TB shape: pure map-side — tokenize, explode the start sequence,
  * slice. ZERO shuffles; expansion factor is exactly ⌈n/stride⌉ per
  * document, driven by data not skew. The token array is STAGED once per
  * document before the explode (the round-4 HOF re-evaluation rule: a
  * naive single projection re-splits the text once per chunk — O(n²/s)
  * in document length).
  *
  * NULL ids and NULL/empty-token texts yield no chunks (no identity /
  * nothing to train on); both engines state the same filter.
  */
object Chunking {

  /** One row per (document, window): `(idCol, chunk_idx, start_tok,
    * chunk_len, chunk_text)` with `start_tok` in tokens and `chunk_text`
    * the space-rejoined token slice (lowercased — the shared tokenizer's
    * domain; chunk identity must agree with dedup/contamination grams).
    */
  def slidingChunks(docs: DataFrame, chunkTokens: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    require(stride >= 1, "stride must be >= 1")
    require(stride <= chunkTokens,
      "stride > chunkTokens drops tokens between windows — that is " +
        "sampling, not chunking; compose a sampler instead")
    val staged = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol),
        Decontaminate.tokens(col(textCol)).as("__graft_toks"))
      .where(size(col("__graft_toks")) > 0)
    staged
      .select(col(idCol), col("__graft_toks"),
        explode(sequence(lit(0),
          size(col("__graft_toks")) - 1, lit(stride))).as("start_tok"))
      .select(
        col(idCol),
        (col("start_tok") / lit(stride)).cast("int").as("chunk_idx"),
        col("start_tok"),
        least(lit(chunkTokens),
          size(col("__graft_toks")) - col("start_tok")).as("chunk_len"),
        array_join(slice(col("__graft_toks"), col("start_tok") + 1,
          least(lit(chunkTokens),
            size(col("__graft_toks")) - col("start_tok"))), " ")
          .as("chunk_text"))
  }
}
