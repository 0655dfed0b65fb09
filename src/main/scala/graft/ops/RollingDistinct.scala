package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling-window EXACT distinct actors — trailing 7-day active users
  * (WAU) and friends: for each day, how many distinct ids were active in
  * the window ending there. The defining problem is that distinct counts
  * do not merge across windows, so the naive plan — `countDistinct` over
  * a width/step sliding-window expand of the RAW event stream — shuffles
  * width/step × the full event volume, then doubles it again in the
  * distinct-aggregate Expand. At 10^12 events that is the single most
  * expensive "simple dashboard number" in telemetry.
  *
  * The scalable shape is dedup-BEFORE-expand: activity is a set property
  * of (id, day), so the first pass reduces events to distinct (id, day)
  * pairs — ONE hash shuffle at event volume with map-side partial
  * aggregation (each task emits each pair once, so the shuffle carries
  * ~|ids × active-days per partition| rows, not the event count; the
  * reduced table is bounded by ids × days, INDEPENDENT of event rate).
  * Only that reduced set is window-expanded (width/step ×) and
  * distinct-counted — the second shuffle is orders of magnitude smaller
  * than the first. Same epoch-aligned `window()` generator as
  * [[Windows.slidingAgg]], so bounds are engine-reproducible.
  *
  * Output per window: `n_active` (distinct ids — the WAU number) and
  * `n_id_days` (id-day pairs — total active days, the engagement-
  * intensity numerator: `n_id_days / (n_active * windowDays)` is the
  * classic stickiness ratio). Null id or ts rows are dropped — a null
  * actor is not an actor (documented, mirrored in the oracle).
  *
  * 100 TB: pass 1 is the only full-volume stage and it is a plain
  * partial-agg dedup — no state, no sort, AQE-skewable; a hot id is a
  * hot *aggregate* key. Pass 2's input is |id-days|; even 10^9 ids ×
  * 365 days expands to ~2.6·10^12 tiny rows at width 7 — still
  * shuffle-light because the rows are (id, day) longs, and partial
  * aggregation collapses them per (window, id) map-side.
  */
object RollingDistinct {

  /** Per trailing window of `windowDays` advancing every `stepDays`:
    * (window_start, window_end, n_active, n_id_days). Only windows
    * containing at least one active id-day appear (the `window()`
    * generator emits no empty windows).
    */
  def rollingActive(events: DataFrame, tsCol: String, idCol: String,
      windowDays: Int, stepDays: Int = 1): DataFrame = {
    require(windowDays > 0 && stepDays > 0,
      "windowDays and stepDays must be positive")
    require(windowDays % stepDays == 0,
      s"windowDays ($windowDays) must be a multiple of stepDays " +
        s"($stepDays): a non-divisor step gives id-days a " +
        "phase-dependent window count")
    val idDay = events
      .filter(col(tsCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("__graft_id"),
        date_trunc("DAY", col(tsCol)).as("__graft_d"))
      .distinct()
    idDay
      .groupBy(window(col("__graft_d"),
        s"$windowDays days", s"$stepDays days").as("__graft_w"))
      .agg(countDistinct(col("__graft_id")).as("n_active"),
        count(lit(1)).as("n_id_days"))
      .select(col("__graft_w.start").as("window_start"),
        col("__graft_w.end").as("window_end"),
        col("n_active"), col("n_id_days"))
  }

  /** Activity STREAKS — per id, the consecutive-day runs (gaps-and-
    * islands): longest streak, streak count, and the most recent
    * streak with its end day. The engagement features every retention
    * model starts from, and [[Retention]]'s per-id complement (the
    * matrix aggregates cohorts; this describes each actor).
    *
    * Same dedup-first foundation as [[rollingActive]]: events reduce
    * to distinct (id, day) at event volume, and everything after runs
    * on the reduced set — the island window sorts AT MOST |active
    * days| rows per id (365/year) regardless of event rate, which is
    * what makes a per-id sort acceptable here when [[Freshness]] had
    * to bucket-bound the same shape over raw events. Islands via the
    * classic `day − row_number` constant (consecutive days share it;
    * the id-day dedup guarantees row_number steps exactly once per
    * day). Longest-streak ties pick the EARLIEST start (max(struct(
    * len, −start)) — the [[Dedup.keepBest]] argmax, sort-free); the
    * "last" streak needs no tie rule (island ends are unique per id).
    *
    * Day columns are epoch-day INTEGERS (unambiguous across engines —
    * a rendered date re-imports differently than a timestamp renders).
    */
  def streaks(events: DataFrame, tsCol: String, idCol: String)
      : DataFrame = {
    val idDay = events
      .filter(col(tsCol).isNotNull && col(idCol).isNotNull)
      .select(col(idCol).as("__graft_id"),
        expr(s"unix_micros(CAST(`$tsCol` AS TIMESTAMP))" +
          " div 86400000000L").as("__graft_d"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__graft_id").orderBy("__graft_d")
    val islands = idDay
      .withColumn("__graft_isl",
        col("__graft_d") - row_number().over(w))
      .groupBy(col("__graft_id"), col("__graft_isl"))
      .agg(count(lit(1)).as("len"), min(col("__graft_d")).as("s"),
        max(col("__graft_d")).as("e"))
    islands.groupBy(col("__graft_id").as(idCol))
      .agg(
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(struct(col("len").as("l"), (-col("s")).as("ns")))
          .as("__graft_lg"),
        max(struct(col("e").as("e"), col("len").as("l")))
          .as("__graft_la"))
      .select(col(idCol),
        col("n_active_days"), col("n_streaks"),
        col("__graft_lg.l").as("longest_streak"),
        (-col("__graft_lg.ns")).as("longest_start_day"),
        col("__graft_la.l").as("last_streak"),
        col("__graft_la.e").as("last_active_day"))
  }
}
