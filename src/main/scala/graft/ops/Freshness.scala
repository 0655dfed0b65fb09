package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feed-freshness / max-gap audit — the SLA number for every source
  * feeding the pipeline: per key (feed, source, event_type…), how many
  * events, when did they start and stop, and the LONGEST silence
  * between consecutive events. A feed whose max gap exceeds its
  * delivery SLA was down and nobody noticed; last_ts alone cannot tell
  * you that (the feed may have recovered).
  *
  * The naive plan windows `lag(ts)` over (key ORDER BY ts) — one sort
  * of the FULL per-key history on a single partition per key. Gap
  * audits run per feed, so key cardinality is small and per-key volume
  * is huge: exactly the shape where a per-key global sort is one
  * straggler task per hot feed. This op bounds the sort the same way
  * [[Quantiles]] bounds the quantile sort:
  *
  *   pass 1  events bucket by `ts div W`; consecutive gaps WITHIN a
  *           (key, bucket) are found by a window whose sort is
  *           bucket-bounded — parallelism is |key × bucket|, not
  *           |key|, and no task ever sorts more than one bucket's
  *           rows. The pass folds each bucket to (min, max, count,
  *           in-bucket max gap).
  *   pass 2  gaps that CROSS bucket boundaries are `next bucket's min
  *           − previous bucket's max` over the per-key bucket sequence
  *           — a window over the HISTOGRAM-sized bucket table. Empty
  *           buckets need no special case: the lag over non-empty
  *           buckets spans them exactly.
  *
  * max_gap = greatest(in-bucket max, boundary max) — identical to the
  * naive form (every consecutive pair is either within one bucket or
  * crosses non-empty-bucket boundaries; ties in ts give 0-gaps in any
  * tie order, so the result is tie-order-invariant). A single-event
  * key has no gaps: max_gap_us is NULL, not 0 — "no silence observed"
  * and "zero silence" are different claims. Integer microseconds
  * throughout; NULL timestamps are dropped (they carry no position in
  * event time).
  */
object Freshness {

  /** Per key: (keyCols…, n, first_ts, last_ts, span_us, max_gap_us).
    * `bucketMicros` is the pass-1 sort bound — any positive value is
    * correct; size it so one bucket's events fit a task comfortably
    * (e.g. 1 hour for a feed doing ~10^6 events/hour).
    */
  def maxGapAudit(events: DataFrame, tsCol: String, keyCols: Seq[String],
      bucketMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(bucketMicros > 0, "bucketMicros must be positive")
    val e = events.filter(col(tsCol).isNotNull)
      .select(keyCols.map(col) :+ col(tsCol).as("__graft_ts"): _*)
      // .cast("timestamp"): parquet tables surface TIMESTAMP_NTZ, which
      // unix_micros rejects (the Sessionize convention; UTC session, so
      // every micros value shifts identically — gaps are differences)
      .withColumn("__graft_us",
        unix_micros(col("__graft_ts").cast("timestamp")))
      .withColumn("__graft_b",
        expr(s"__graft_us div ${bucketMicros}L"))
    val bucketKeys = (keyCols :+ "__graft_b").map(col)
    val wIn = Window.partitionBy(bucketKeys: _*).orderBy("__graft_us")
    val perBucket = e
      .withColumn("__graft_gap",
        col("__graft_us") - lag("__graft_us", 1).over(wIn))
      .groupBy(bucketKeys: _*)
      .agg(min(col("__graft_ts")).as("__graft_mnts"),
        max(col("__graft_ts")).as("__graft_mxts"),
        min(col("__graft_us")).as("__graft_mn"),
        max(col("__graft_us")).as("__graft_mx"),
        count(lit(1)).as("__graft_cnt"),
        max(col("__graft_gap")).as("__graft_ing"))
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy("__graft_b")
    perBucket
      .withColumn("__graft_bgap",
        col("__graft_mn") - lag("__graft_mx", 1).over(wB))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__graft_cnt")).as("n"),
        min(col("__graft_mnts")).as("first_ts"),
        max(col("__graft_mxts")).as("last_ts"),
        (max(col("__graft_mx")) - min(col("__graft_mn"))).as("span_us"),
        greatest(max(col("__graft_ing")), max(col("__graft_bgap")))
          .as("max_gap_us"))
  }
}
