package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted index construction — term → (document frequency, posting
  * list): the lookup structure decontamination probes, keyword triage,
  * and corpus search all build on. Terms are lowercased whitespace
  * tokens deduplicated PER DOCUMENT (a posting is "term appears in
  * doc", not an occurrence count), postings are doc_ids in ascending
  * order.
  *
  * Skew rule (defaults ON, the round-5 family rule): a stopword's
  * posting list is the corpus itself — collecting it is the OOM. `df`
  * is always the FULL document frequency (the statistic survives), but
  * the materialized list keeps only the `maxPostings` smallest doc_ids
  * (deterministic prefix — rank before collect, so no unbounded
  * aggregation state ever exists), with `truncated` flagging capped
  * terms. 0 opts out explicitly.
  *
  * 100 TB shape: explode is map-side; ONE hash shuffle on term feeds
  * both the rank window and the rollup (shared partitioning, single
  * Exchange); per-term state is bounded by the cap.
  */
object InvertedIndex {

  /** One row per distinct term: (term, df, postings, truncated).
    * NULL ids and NULL texts drop (no posting identity / no terms).
    */
  def postings(docs: DataFrame, maxPostings: Int = 1024,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxPostings >= 0, "maxPostings must be >= 0 (0 = uncapped)")
    val terms = docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(filter(
          split(lower(col(textCol)), "\\s+"), t => length(t) > 0)))
          .as("term"))
    val w = Window.partitionBy("term").orderBy(col("doc_id"))
    val ranked = terms.withColumn("rn", row_number().over(w))
    val keep =
      if (maxPostings == 0) col("rn") >= 1 else col("rn") <= maxPostings
    ranked.groupBy("term").agg(
      count(lit(1)).as("df"),
      sort_array(collect_list(when(keep, col("doc_id"))))
        .as("postings"))
      .withColumn("truncated", size(col("postings")) < col("df"))
  }
}
