package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** State-timeline (SCD-2) builder — collapse an event stream into the
  * intervals during which each key held each value: (key, value,
  * valid_from, valid_to half-open, n_events). This is the
  * change-data-capture compaction every warehouse dimension needs —
  * "what state was this user/feed/conv in at time t" answered by an
  * interval join ([[IntervalJoin]]) instead of a scan-back through raw
  * events — and the inverse of [[SnapshotDiff]] (which diffs two
  * snapshots; this derives ALL snapshots from the log).
  *
  * The naive plan is one `lag` window over (key ORDER BY ts) — a full
  * per-key history sort, one straggler task per hot key (the
  * [[Freshness]] problem again). Same cure, two passes:
  *
  *   pass 1  events bucket by `ts div W`; run detection (value ≠
  *           null-safe lag) happens INSIDE each (key, bucket) — the
  *           sort is bucket-bounded — and folds each run to
  *           (value, start_ts, n). A run that spans a bucket boundary
  *           becomes two rows here, deliberately.
  *   pass 2  the RUNS table (compacted: |state changes| + one row per
  *           spanned boundary, never |events|) gets the same change
  *           detection over (key ORDER BY start_ts, value) — stitching
  *           boundary-split runs back together — plus the `lead` that
  *           closes each interval. Windows here sort runs, not events.
  *
  * Determinism under ties is pinned: events with equal ts order by
  * value (ascending) for change detection, so simultaneous
  * different-value events produce a zero-length interval for the
  * lesser value — visible, deterministic, engine-replayable — rather
  * than a nondeterministic winner. Equal (ts, value) duplicates are
  * order-free (same value ⇒ no change either way). Cross-bucket ties
  * cannot exist (equal ts ⇒ equal bucket). A NULL value is a real
  * state ("unknown"), runs of NULL collapse like any other (null-safe
  * `<=>` comparison); NULL ts rows are dropped (no position in event
  * time). The final interval of each key has `valid_to` NULL — open,
  * the state still in force.
  */
object Scd {

  /** Build the interval table: (keyCols…, valCol, valid_from,
    * valid_to, n_events). `bucketMicros` bounds the pass-1 sort, as in
    * [[Freshness.maxGapAudit]].
    */
  def stateIntervals(events: DataFrame, tsCol: String, valCol: String,
      keyCols: Seq[String], bucketMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(bucketMicros > 0, "bucketMicros must be positive")
    val e = events.filter(col(tsCol).isNotNull)
      .select(keyCols.map(col) ++
        Seq(col(tsCol).as("__graft_ts"), col(valCol).as("__graft_v")): _*)
      .withColumn("__graft_b",
        expr("unix_micros(CAST(__graft_ts AS TIMESTAMP))" +
          s" div ${bucketMicros}L"))
    val keyB = (keyCols :+ "__graft_b").map(col)
    val w1 = Window.partitionBy(keyB: _*)
      .orderBy(col("__graft_ts"), col("__graft_v"))
    val runs = e
      .withColumn("__graft_chg",
        when(!(col("__graft_v") <=> lag("__graft_v", 1).over(w1)), 1L)
          .otherwise(0L))
      .withColumn("__graft_rid",
        sum(col("__graft_chg")).over(
          w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyB :+ col("__graft_rid"): _*)
      .agg(min(col("__graft_v")).as("__graft_v"),
        min(col("__graft_ts")).as("__graft_start"),
        count(lit(1)).as("__graft_n"))
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__graft_start"), col("__graft_v"))
    val stitched = runs
      .withColumn("__graft_chg2",
        when(!(col("__graft_v") <=> lag("__graft_v", 1).over(w2)), 1L)
          .otherwise(0L))
      .withColumn("__graft_gid",
        sum(col("__graft_chg2")).over(
          w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyCols.map(col) :+ col("__graft_gid"): _*)
      .agg(min(col("__graft_v")).as(valCol),
        min(col("__graft_start")).as("valid_from"),
        sum(col("__graft_n")).as("n_events"))
    val w3 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"), col(valCol))
    stitched
      .withColumn("valid_to", lead("valid_from", 1).over(w3))
      .select(keyCols.map(col) ++ Seq(col(valCol), col("valid_from"),
        col("valid_to"), col("n_events")): _*)
  }

  /** Query the interval table: the state of every key AS OF `at` —
    * the "what was this user's plan / this feed's config at incident
    * time" question, answered by a map-side FILTER over the (already
    * built, already small) interval table instead of a scan-back
    * through raw events. Half-open semantics make the predicate exact:
    * `valid_from <= at < valid_to` (open last interval = still in
    * force). Keys whose first interval starts after `at` are absent —
    * they had no state yet, and inventing one would be the
    * null-over-wrong rule in reverse. `at` is a Column (SQL literal),
    * the [[TtlPlan]] timezone rule.
    */
  def snapshotAt(intervals: DataFrame, at: Column, keyCols: Seq[String],
      valCol: String): DataFrame =
    intervals
      // .cast("timestamp"): NTZ-vs-literal comparison, TtlPlan rule
      .filter(col("valid_from").cast("timestamp") <= at &&
        (col("valid_to").isNull ||
          at < col("valid_to").cast("timestamp")))
      .select(keyCols.map(col) ++ Seq(col(valCol).as("state"),
        col("valid_from").as("since"), col("n_events")): _*)
}
