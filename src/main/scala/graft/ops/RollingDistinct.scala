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
}
