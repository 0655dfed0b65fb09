package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and drop) training documents that
  * overlap an evaluation set by shared word n-grams — the GPT-3/Pile-style
  * "13-gram decontamination" a training corpus runs before release, so
  * eval answers don't leak into the training set.
  *
  * 100 TB shape: the eval side of the join is a BENCHMARK (MBs, not TBs) —
  * its deduplicated gram set is broadcast, so the train side is one
  * map-side explode + broadcast semi-probe; the only shuffle is the
  * per-doc count over the (tiny) matched rows. Nothing ever shuffles the
  * corpus itself.
  */
object Decontaminate {

  /** Distinct word n-grams built from an ALREADY-MATERIALIZED token-array
    * column. The tokens must be a plain attribute reference: higher-order
    * -function lambdas re-evaluate non-lambda subexpressions per element,
    * so inlining the `split()` here would re-split the document once per
    * token — O(tokens^2) in the document length (the q48 lesson).
    */
  def ngramsOfTokens(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        filter(
          transform(
            sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
            i => slice(toks, i, lit(n))),
          a => size(a) === lit(n)),
        a => concat_ws(" ", a)))

  /** Whitespace-split lowercased tokens (the normalization mirrors
    * `TextStats`/simhash tokenization so "overlap" means the same thing
    * across ops). Materialize this as a column BEFORE feeding it to
    * [[ngramsOfTokens]].
    *
    * Empty tokens are filtered out, NOT trimmed away: Spark `trim` strips
    * only 0x20 spaces while `split` keeps boundary empties, so
    * "the answer\n" used to tokenize to [the, answer, ""] — a phantom
    * token shared by every newline-terminated document, inflating minhash
    * Jaccard, fabricating cross-doc n-grams through concat_ws, and
    * padding token counts (round-5 fix; the filter also makes empty text
    * yield [] instead of split("")'s [""], and its lambda touches only
    * the lambda var, so the HOF re-evaluation rule is not violated).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  private def explodedGrams(df: DataFrame, textCol: String, n: Int,
      keep: Column*): DataFrame =
    df.select(keep :+ tokens(col(textCol)).as("__graft_toks"): _*)
      .select(keep :+ explode(ngramsOfTokens(col("__graft_toks"), n))
        .as("gram"): _*)

  /** Per-document count of distinct word n-grams shared with ANY eval
    * document: `(idCol, shared_ngrams)`, only documents with >= 1 shared
    * gram appear.
    */
  def contaminationScores(docs: DataFrame, evalDocs: DataFrame, n: Int = 13,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = explodedGrams(evalDocs, textCol, n).distinct()
    explodedGrams(docs, textCol, n, col(idCol))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(idCol).agg(count(lit(1)).as("shared_ngrams"))
  }

  /** The keep set: docs minus those sharing >= `minShared` distinct
    * n-grams with the eval set (anti-join on the score table).
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, n: Int = 13,
      minShared: Int = 1, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // NULL-SAFE anti join: a contaminated doc with a null id must still be
    // dropped — plain equality never matches null keys, so such docs
    // previously sailed through the "clean" output (round-5 fix). The
    // contaminated side stays tiny (it is bounded by the matched grams),
    // so the null-safe condition costs nothing extra at scale.
    // NOTE `idCol` is a KEY by contract; null ids all conflate to one
    // group, so if ANY null-id doc is contaminated, EVERY null-id doc is
    // dropped — deliberately conservative (never leak eval data because
    // the ingest broke its own key), not per-row precise.
    val dropIds = contaminationScores(docs, evalDocs, n, textCol, idCol)
      .where(col("shared_ngrams") >= minShared)
      .select(col(idCol).as("__graft_contaminated_id"))
    docs.join(dropIds, docs(idCol) <=> dropIds("__graft_contaminated_id"),
      "left_anti")
  }
}
