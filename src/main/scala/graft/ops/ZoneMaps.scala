package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone-map pruning audit — the measurement half of the data-layout
  * family ([[Zorder]] builds layouts, [[Quantiles.rangeBoundaries]]
  * plans them; this op tells you whether a layout actually EARNS its
  * sort): compute per-bucket min/max statistics (what Iceberg manifests
  * and parquet row-group footers store) and, for each candidate range
  * predicate, how many buckets the statistics would prune and how many
  * false-positive rows the survivors still scan. `rows_scanned -
  * rows_matched` is the exact I/O the layout wastes; comparing the same
  * predicates across two bucket assignments (insertion order vs
  * value-clustered) is the quantitative case for paying a write-side
  * sort at 100 TB.
  *
  * One full-volume pass: per-bucket min/max/count AND per-predicate
  * matched counts ride a single hash aggregate (the predicate list is
  * known at plan time, so each predicate is one `sum(when(...))` column
  * — map-side partial, one shuffle on bucket, no second scan). The
  * zone-map table is |buckets| rows; the predicate audit over it is a
  * tiny cross join (|buckets| × |predicates|) that never touches the
  * fact table again — exactly how an engine's planner consults
  * manifests without reading data files.
  *
  * Semantics pinned for the oracle: min/max skip NULLs (parquet
  * convention); a NULL value never satisfies a range predicate but DOES
  * count in `rows_total`/`rows_scanned` of its bucket — and an all-NULL
  * bucket has NULL statistics and is prunable for every range predicate
  * (`coalesce(mx < lo or mn > hi, true)`).
  */
object ZoneMaps {

  /** One row per predicate: (pred_idx, lo, hi, n_buckets, n_pruned,
    * rows_total, rows_scanned, rows_matched) for inclusive-range
    * predicates `lo <= valueCol <= hi` against the zone maps of
    * `bucketCol`-grouped buckets. Invariants a sound zone map must
    * satisfy (spec-asserted): rows_matched <= rows_scanned <=
    * rows_total and n_pruned <= n_buckets.
    */
  def pruningAudit(df: DataFrame, bucketCol: Column, valueCol: String,
      predicates: Seq[(Long, Long)]): DataFrame = {
    require(predicates.nonEmpty, "at least one predicate")
    predicates.foreach { case (lo, hi) =>
      require(lo <= hi, s"empty predicate range [$lo, $hi]") }
    val v = col(valueCol)
    val matchedAggs = predicates.zipWithIndex.map { case ((lo, hi), i) =>
      sum(when(v >= lo && v <= hi, 1L).otherwise(0L)).as(s"__graft_m$i")
    }
    val zm = df
      .groupBy(bucketCol.as("__graft_b"))
      .agg(min(v).as("__graft_mn"),
        (max(v).as("__graft_mx") +: count(lit(1)).as("__graft_cnt") +:
          matchedAggs): _*)
    val predRows = array(predicates.zipWithIndex.map { case ((lo, hi), i) =>
      struct(lit(i).as("pred_idx"), lit(lo).as("lo"), lit(hi).as("hi"))
    }: _*)
    val matchedByPred = array(
      predicates.indices.map(i => col(s"__graft_m$i")): _*)
    val pruned = coalesce(
      col("__graft_mx") < col("__graft_p.lo") ||
        col("__graft_mn") > col("__graft_p.hi"), lit(true))
    zm.withColumn("__graft_ms", matchedByPred)
      .select(col("__graft_mn"), col("__graft_mx"), col("__graft_cnt"),
        col("__graft_ms"), explode(predRows).as("__graft_p"))
      .groupBy(col("__graft_p.pred_idx").as("pred_idx"),
        col("__graft_p.lo").as("lo"), col("__graft_p.hi").as("hi"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(pruned, 1L).otherwise(0L)).as("n_pruned"),
        sum(col("__graft_cnt")).as("rows_total"),
        sum(when(!pruned, col("__graft_cnt")).otherwise(0L))
          .as("rows_scanned"),
        sum(element_at(col("__graft_ms"),
          col("__graft_p.pred_idx") + 1)).as("rows_matched"))
  }
}
