package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-shaped rollups: the two aggregation patterns that naive SQL gets
  * wrong at 100 TB.
  *
  * 1. [[distinctRollup]] — "distinct entities AND per-entity
  *    distribution statistics per group", in one pass. For a SINGLE
  *    distinct aggregate Catalyst itself already plans the Expand-free
  *    two-level shape (verified in RollupsSpec — `count(DISTINCT u),
  *    count(*), sum(x)` aggregates on (keys, u) first; Expand only
  *    appears once a query mixes ≥2 DISTINCT groups). What the flat form
  *    CANNOT express is a statistic of the per-entity distribution —
  *    max/min/avg events or spend per entity within the group — without
  *    a subquery. distinctRollup exposes that level directly: innerAggs
  *    stage per-entity partials, outerAggs fold them, and the plan stays
  *    the same two exchanges with no Expand however many aggregates ride
  *    along (pinned by spec), because everything derives from ONE entity
  *    column in one pass.
  *
  * 2. [[topKPerGroup]] — "top-k entities by an aggregate within each
  *    group". The naive window-over-raw-rows form sorts the full corpus
  *    per group; here the aggregate shrinks the data to one row per
  *    (group, entity) FIRST, and the rank window runs over that already
  *    small table. Ties break on the entity id, so the selected set is
  *    deterministic.
  */
object Rollups {

  /** Exact distinct-count rollup without Expand.
    *
    * @param innerAggs aggregates evaluated per (keys..., entityCol) —
    *                  stage per-entity partials here (e.g.
    *                  `sum(cents).as("cents")`); the per-entity row
    *                  count is staged for you as `entity_rows`
    * @param outerAggs aggregates folding the inner columns per keys —
    *                  names resolve against the inner result, so
    *                  `max("entity_rows")` is the busiest entity and
    *                  `max("cents")` the biggest per-entity spend
    * @return one row per keys: `distinctName` (exact distinct entities),
    *         `n_rows` (total input rows), plus outerAggs
    */
  def distinctRollup(df: DataFrame, keys: Seq[Column], entityCol: Column,
      distinctName: String = "n_distinct",
      innerAggs: Seq[Column] = Nil,
      outerAggs: Seq[Column] = Nil): DataFrame = {
    require(keys.nonEmpty, "distinctRollup needs at least one key")
    val inner = df
      .groupBy(keys :+ entityCol.as("__graft_entity"): _*)
      .agg(count(lit(1)).as("entity_rows"), innerAggs: _*)
    // HashPartitioning(keys, entity) does NOT satisfy clustering on keys
    // alone, so the fold is a second (small) exchange — its input is one
    // row per live (keys, entity), not the corpus. count(entity) — not
    // count(*) — so a NULL entity is excluded from the distinct count
    // exactly as SQL's COUNT(DISTINCT entity) excludes it, while its
    // rows still land in n_rows and the folded aggregates.
    inner.groupBy(inner.columns.takeWhile(_ != "__graft_entity").map(col): _*)
      .agg(count(col("__graft_entity")).as(distinctName),
        sum("entity_rows").as("n_rows") +: outerAggs: _*)
  }

  /** Top-k entities per group by an aggregated metric, largest first,
    * equal metrics broken by ascending entity id (deterministic).
    * Output: groupCols, entity, `metric`, `rank` (1-based).
    *
    * The metric should be exact (integer counts/cents) when cross-engine
    * reproducibility matters — a float sum's value is partition-order-
    * dependent and can flip a tie.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], entityCol: String,
      metric: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val agg = df.groupBy((groupCols :+ entityCol).map(col): _*)
      .agg(metric.as("metric"))
    // asc_nulls_last: a NULL entity forms a group in both engines, but
    // Spark's bare asc sorts nulls FIRST while DuckDB/ANSI default to
    // nulls LAST — pin the portable order so a cents tie against the
    // anonymous group cannot flip the selected set across engines.
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("metric").desc, col(entityCol).asc_nulls_last)
    agg.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Every prefix granularity of a reporting hierarchy in ONE pass —
    * `(a, b, c)`, `(a, b)`, `(a)`, and the grand total from a single
    * `rollup` aggregate, instead of the N-separate-GROUP-BYs form that
    * reads the corpus once per level. Spark plans this as one Expand
    * (each input row fans out to levels+1 aggregation rows map-side)
    * feeding ONE partial-aggregated shuffle — at 10^12 rows the corpus
    * is scanned once, and the fan-out rows collapse in the map-side
    * hash aggregate long before the exchange.
    *
    * `gid` is Spark's `grouping_id()` bit vector (bit set = column
    * rolled up), identical to ANSI/DuckDB `GROUPING(a, b, …)` — the
    * portable way to tell a rolled-up NULL from a genuine NULL key.
    */
  /** Merge PARTIAL aggregate tables — incremental rollup maintenance.
    * At 10^12 rows the daily pattern is never "re-aggregate history":
    * each increment (day, hour, backfill shard) aggregates once, and
    * the running rollup folds the partials. That only works for
    * ALGEBRAIC aggregates, and the combiner is not the original
    * aggregate: counts re-combine with SUM (a count-of-counts would be
    * the number of partials), sums with sum, min/max with min/max.
    * Non-algebraic metrics (avg, distinct counts, medians) must be
    * carried as their algebraic parts instead (sum+count; distinct
    * needs the entity-level table or a mergeable sketch) — this op
    * REJECTS unknown kinds loudly rather than folding them wrongly.
    *
    * Shape: unionByName (map-side, no schema positional traps) + one
    * hash aggregate on the keys — partials-sized, never corpus-sized.
    *
    * @param specs (column, kind) with kind ∈ count | sum | min | max;
    *              `count` documents intent and folds as sum
    */
  def mergePartials(parts: Seq[DataFrame], keys: Seq[String],
      specs: Seq[(String, String)]): DataFrame = {
    require(parts.nonEmpty, "at least one partial table")
    require(keys.nonEmpty, "at least one key")
    require(specs.nonEmpty, "at least one metric")
    val aggs = specs.map {
      case (c, "count" | "sum") => sum(col(c)).as(c)
      case (c, "min")           => min(col(c)).as(c)
      case (c, "max")           => max(col(c)).as(c)
      case (c, kind) => throw new IllegalArgumentException(
        s"mergePartials: '$c' has non-algebraic kind '$kind' — carry " +
          "its algebraic parts (e.g. sum+count for avg) instead")
    }
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  def hierarchicalRollup(df: DataFrame, levels: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    require(levels.nonEmpty, "at least one hierarchy level")
    require(aggs.nonEmpty, "at least one aggregate")
    df.rollup(levels.map(col): _*)
      .agg(aggs.head,
        (aggs.tail :+ grouping_id().cast("int").as("gid")): _*)
  }
}
