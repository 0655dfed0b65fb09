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
}
