package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window event rollups — the other half of the telemetry family
  * next to the tumbling hourly rollup (q30) and gap sessionization
  * ([[Sessionize]]): every event contributes to width/slide overlapping
  * windows (e.g. a 1-hour window sliding every 15 minutes), the shape a
  * rate monitor or SLO burn alert actually reads.
  *
  * Built on Spark's native `window()` generator, which expands each row
  * into its covering windows map-side (an Expand node, no join against a
  * window table) and then aggregates — ONE hash shuffle on
  * (window, keys), with partial aggregation before it. The expansion
  * factor is exactly width/slide, so sizing is explicit: a 4x overlap
  * costs 4x the aggregate input rows, never a range-join blowup. Windows
  * are epoch-aligned (1970-01-01 UTC), so alignment is reproducible
  * across engines and across runs without a per-job anchor row.
  *
  * `width` must be a positive multiple of `slide`: a non-divisor slide
  * makes the per-event window count vary by phase, which silently skews
  * rate comparisons between windows (and is almost never what a monitor
  * means). The timestamp column passes through UNCAST — `window()`
  * handles both TIMESTAMP and TIMESTAMP_NTZ, and preserving NTZ (what
  * the parquet tables surface) keeps the window bounds naive-comparable
  * in any engine (this project runs UTC everywhere regardless).
  *
  * 100 TB shape: map-side expand + partial agg means the shuffle carries
  * one row per (window, key) per input partition, not per event; a hot
  * key is a hot aggregate key and AQE's skew handling applies. No state,
  * no sort — this is the batch analog of the streaming windowed
  * aggregation in streaming/StreamingScan.
  */
object Windows {

  /** Per (window_start, window_end, keyCols...) aggregates over sliding
    * windows of `widthSeconds` advancing every `slideSeconds`.
    */
  def slidingAgg(events: DataFrame, widthSeconds: Long, slideSeconds: Long,
      tsCol: String, keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(widthSeconds > 0 && slideSeconds > 0,
      "width and slide must be positive")
    require(widthSeconds % slideSeconds == 0,
      s"width ($widthSeconds s) must be a multiple of slide " +
        s"($slideSeconds s): a non-divisor slide gives events a " +
        "phase-dependent window count")
    require(aggs.nonEmpty, "at least one aggregate")
    val w = window(col(tsCol),
      s"$widthSeconds seconds", s"$slideSeconds seconds")
    events
      .groupBy(w.as("__graft_w") +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("__graft_w.start"))
      .withColumn("window_end", col("__graft_w.end"))
      .drop("__graft_w")
  }

  /** Throttle/admission REPLAY — simulate a "first K events per key
    * per tumbling window" quota against history and report, per key,
    * exactly what the limiter would have done: n_admitted, n_dropped,
    * and how many windows hit the cap. The question every quota change
    * triggers ("who would this throttle?") answered from the log
    * before the config ships, with the same first-come-first-served
    * rule a real limiter applies.
    *
    * Admission order within a window is (ts, tieCols…) — callers pass
    * a unique tie-breaker (event id), otherwise simultaneous events
    * would be admitted nondeterministically, which is exactly the bug
    * a replay exists to avoid. The rank window partitions by (key,
    * tumbling window), so the sort is WINDOW-BOUNDED — a hot key costs
    * |its busiest window|, never its full history ([[Freshness]]'s
    * bound, for free from the tumbling grid). One shuffle, then a
    * key-level fold. NULL ts rows never reach a limiter (no arrival
    * time) and are dropped, like the op they simulate.
    */
  def throttleAudit(events: DataFrame, tsCol: String,
      keyCols: Seq[String], tieCols: Seq[String], k: Int,
      windowSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty && tieCols.nonEmpty,
      "key and tie-breaker columns required")
    require(k >= 1 && windowSeconds > 0,
      "k and windowSeconds must be positive")
    val wcol = window(col(tsCol), s"$windowSeconds seconds")
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col) :+ col("__graft_w"): _*)
      .orderBy((tsCol +: tieCols).map(col(_).asc): _*)
    events.filter(col(tsCol).isNotNull)
      .withColumn("__graft_w", wcol)
      .withColumn("__graft_rn", row_number().over(rankW))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__graft_rn") <= k, 1L).otherwise(0L))
          .as("n_admitted"),
        sum(when(col("__graft_rn") > k, 1L).otherwise(0L))
          .as("n_dropped"),
        countDistinct(col("__graft_w")).as("n_windows"),
        sum(when(col("__graft_rn") === k + 1, 1L).otherwise(0L))
          .as("n_capped_windows"))
  }
}
