package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TTL retention / compaction planner — the table-maintenance decision
  * a 100 TB Iceberg pipeline runs nightly: given a retention cutoff,
  * which data buckets (files / partitions) can be DROPPED whole (every
  * row expired — a metadata-only delete, the cheap path), which must
  * be REWRITTEN (mixed live and expired rows — the expensive path that
  * actually copies data), and which are untouched? The plan quantifies
  * the rewrite bill BEFORE paying it: `rows_live` in rewrite buckets
  * is exactly the data a compaction job will copy, and a layout whose
  * buckets correlate with event time ([[Zorder]], [[Quantiles
  * .rangeBoundaries]] on ts) turns rewrite buckets into drop buckets —
  * the same write-side-sort dividend [[ZoneMaps]] measures for reads.
  *
  * One full-volume pass: per-bucket (rows, expired, null-ts) counts via
  * a map-side-partial aggregate; the verdict fold runs over the
  * bucket-sized table. NULL timestamps are counted apart and treated
  * as LIVE — expiry cannot be proven for a row with no position in
  * time, and silently dropping it would be data loss (`n_null_ts`
  * surfaces the flood so the owner can fix the producer instead).
  * A bucket of only NULL-ts rows is therefore `keep`.
  */
object TtlPlan {

  /** One row per verdict in {drop, rewrite, keep}: (verdict,
    * n_buckets, rows_total, rows_expired, rows_live, n_null_ts).
    * Verdict classes with no buckets are absent (count them as zero).
    *
    * `cutoff` is a Column (e.g. `expr("TIMESTAMP '2024-01-15
    * 00:00:00'")`), NOT a java.sql.Timestamp: `Timestamp.valueOf`
    * parses in the JVM default timezone, which the build pins for the
    * Spark SESSION but not for the JVM — a host with TZ=America/
    * New_York would shift the literal's instant five hours and change
    * every verdict (review find). A SQL timestamp literal parses in
    * the session timezone, which IS pinned.
    */
  def retentionPlan(df: DataFrame, bucketCol: Column, tsCol: String,
      cutoff: Column): DataFrame = {
    // .cast("timestamp"): parquet tables surface TIMESTAMP_NTZ and the
    // literal is TIMESTAMP — the Sessionize convention (UTC session, so
    // the comparison is tz-shift-free either way)
    val expired = col(tsCol).isNotNull &&
      col(tsCol).cast("timestamp") < cutoff
    val perBucket = df
      .groupBy(bucketCol.as("__graft_b"))
      .agg(count(lit(1)).as("__graft_n"),
        sum(when(expired, 1L).otherwise(0L)).as("__graft_e"),
        sum(when(col(tsCol).isNull, 1L).otherwise(0L))
          .as("__graft_nul"))
    perBucket
      .withColumn("verdict",
        when(col("__graft_e") === col("__graft_n"), lit("drop"))
          .when(col("__graft_e") === 0L, lit("keep"))
          .otherwise(lit("rewrite")))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__graft_n")).as("rows_total"),
        sum(col("__graft_e")).as("rows_expired"),
        sum(col("__graft_n") - col("__graft_e")).as("rows_live"),
        sum(col("__graft_nul")).as("n_null_ts"))
  }
}
