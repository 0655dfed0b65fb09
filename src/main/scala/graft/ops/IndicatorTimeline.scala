package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Indicator timeline + rarity triage — the aggregate a threat-intel
  * consumer runs OVER the scan's match stream: per observed indicator
  * value, when it was first/last seen, how many turns and how many
  * distinct conversations it touched, and a per-type rarity rank so the
  * triage queue surfaces the RAREST indicators first (an indicator seen
  * in 2 conversations is a lead; one seen in 40k is wallpaper). The
  * reference's users build exactly this over its NDJSON match stream
  * (one line per hit, bin/match_processor/sequential.rs:154-187); here
  * it is one declarative aggregate over [[graft.pipeline.ScanJob.matched]].
  *
  * Shape: the match stream carries (conv_id, turn_idx) but not the turn
  * timestamp (the NDJSON field shape is reference-pinned), so the
  * timeline joins matches back to the transcript table on the SAME
  * (conv_id, turn_idx) key the routed sinks bucket by — at cluster scale
  * both sides co-partition with the flagship layout and the join adds no
  * new shuffle beyond the aggregate's own. The output is
  * indicator-cardinality (distinct observed values), orders of magnitude
  * below turn-cardinality, so the per-type rank window runs over an
  * already-aggregated table — never over the corpus.
  *
  * Rarity rank: row_number per indicator_type ordered by (n_convs,
  * n_matches, value) — fully tie-broken, so ranks are deterministic.
  * Exactness: counts are exact longs; first/last seen are min/max of
  * integer microseconds; no floats anywhere.
  */
object IndicatorTimeline {

  /** @param matched [[graft.pipeline.ScanJob.matched]]-shaped rows
    *                (conv_id, turn_idx, database_id, indicator_type,
    *                value, ...)
    * @param turns   the transcript table carrying (conv_id, turn_idx, ts);
    *                (conv_id, turn_idx) must be unique (the north rule's
    *                stable turn identity) — duplicate turn keys would
    *                multiply match counts through the join
    * @return one row per (database_id, indicator_type, value):
    *         n_matches, n_convs, first_seen_us, last_seen_us, rarity_rank
    */
  def timeline(matched: DataFrame, turns: DataFrame): DataFrame = {
    val ts = turns.select(col("conv_id"), col("turn_idx"),
      // cast: TIMESTAMP_NTZ-safe under the UTC session tz (Conversations)
      unix_micros(col("ts").cast("timestamp")).as("__graft_tus"))
    val agg = matched
      .join(ts, Seq("conv_id", "turn_idx"))
      .groupBy("database_id", "indicator_type", "value")
      .agg(
        count(lit(1)).as("n_matches"),
        countDistinct(col("conv_id")).as("n_convs"),
        min(col("__graft_tus")).as("first_seen_us"),
        max(col("__graft_tus")).as("last_seen_us"))
    agg.withColumn("rarity_rank",
      row_number().over(Window.partitionBy(col("indicator_type"))
        .orderBy(col("n_convs").asc, col("n_matches").asc,
          col("value").asc)))
  }
}
