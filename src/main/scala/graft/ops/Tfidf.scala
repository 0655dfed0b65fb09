package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF distinctive-term extraction — per document, the k terms that
  * best distinguish it from the corpus (keyword extraction / topic
  * labeling / index-building, the classic text-curation rollup).
  *
  * Ranking is by the INTEGER key (tf DESC, df ASC, term ASC) — the same
  * order as the float score tf·ln(N/df) wherever that score is
  * well-ordered (ln(N/df) is strictly decreasing in df), but with
  * engine-exact arithmetic: the float formula ties and last-ulp
  * rounding differ across engines, while integer (tf, df) compares
  * identically everywhere, and the deterministic term tie-break makes
  * the selected SET reproducible run-to-run. tf and df ride along in
  * the output so a caller can apply any smoothing variant
  * (ln(N/(1+df)), BM25 saturation, …) map-side without re-scanning.
  *
  * Tokenization is [[Decontaminate.tokens]] — the repo's single shared
  * normalizer (lowercase, whitespace split), so contamination grams,
  * minhash shingles, and these terms all agree on what a "word" is.
  *
  * 100 TB shape: three linear hash shuffles, no self-join —
  * (doc, term) for tf with map-side partial aggregation, term for df
  * (the df side is one row per VOCABULARY term, orders of magnitude
  * smaller than the corpus), then doc for the top-k window. The df
  * join is a plain equi-join Spark sizes itself (AQE broadcasts it when
  * the vocabulary fits). A boilerplate term occurring in every document
  * costs one df row, never a pair explosion.
  */
object Tfidf {

  /** Top-`k` distinctive terms per document:
    * `(idCol, term, tf, df, rank)`. Documents with no tokens emit no
    * rows. Terms shorter than `minTermLen` chars are dropped (single
    * characters and bare punctuation are never distinctive).
    */
  def topTerms(docs: DataFrame, k: Int, textCol: String = "text",
      idCol: String = "doc_id", minTermLen: Int = 2): DataFrame = {
    require(k > 0, "k must be positive")
    val terms = docs
      .select(col(idCol), explode(Decontaminate.tokens(col(textCol)))
        .as("term"))
      .where(length(col("term")) >= minTermLen)
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("rank"))
  }
}
