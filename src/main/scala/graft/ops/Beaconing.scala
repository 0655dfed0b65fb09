package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Beaconing detection — the telemetry hunt that pairs with the IoC scan:
  * a key (an agent, a user↔indicator pair, a conv) whose events arrive at
  * REGULAR intervals is machine-driven (C2 heartbeat, poller, cron), while
  * human-driven activity has irregular inter-arrival gaps. The detector
  * flags keys whose gap spread is small RELATIVE to the gap size:
  * MAD(gaps) ≤ madPermille/1000 × median(gaps).
  *
  * Robust statistics deliberately (the [[Anomaly]] rule): median and MAD
  * are NEAREST-RANK selections over exact integer microsecond gaps — no
  * float sums, no variance, so the flag set is bit-identical in any
  * engine and a single wild outlier gap (one missed heartbeat) cannot
  * unflag a real beacon the way it would wreck a stddev-based score.
  * The threshold compare `mad * 1000 <= median * madPermille` is PURE
  * INTEGER (gaps ≤ ~292k years before the ×1000 could overflow int64).
  *
  * Shape: ONE hash shuffle on the key. The lag, both median window
  * passes, and the final fold all ride the same key partitioning (the
  * per-key sorts re-sort inside unchanged partitions — no extra
  * exchange). Per-key state is bounded by that key's event count — the
  * same bound as any per-entity window; a pathologically hot key is a
  * sessionization-class skew, not a join explosion.
  *
  * Degenerate cases, pinned: a key needs `minGaps + 1` events to flag
  * (fewer gaps than minGaps ⇒ is_beacon = false, but the key still
  * reports its stats — auditable, never silently dropped); keys with < 2
  * events have no gaps and are absent; a median gap of 0 (event bursts
  * on one timestamp) never flags — a burst is not a beacon. Ties in ts
  * are broken by `tieCol` for the LAG order, but the gap MULTISET — and
  * therefore median/MAD — depends only on the sorted timestamp multiset,
  * so the output is deterministic even under ts collisions.
  */
object Beaconing {

  /** Per-key gap statistics + beacon flag.
    *
    * @param events      input; rows with a NULL timestamp are ignored
    *                    (they carry no arrival information). NULL key
    *                    values group together (GROUP BY semantics).
    * @param keyCols     beacon candidate key (e.g. user, or user×type)
    * @param tsCol       event timestamp column (castable to timestamp)
    * @param tieCol      deterministic order tiebreak within equal ts
    * @param minGaps     gaps required before a key may flag (≥ 1)
    * @param madPermille regularity bound: flag iff
    *                    mad ≤ madPermille/1000 × median (200 = "spread
    *                    within 20% of the period")
    * @return one row per key with ≥ 1 gap:
    *         keyCols..., n_gaps, median_gap_us, mad_gap_us, is_beacon
    */
  def detect(events: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, minGaps: Int = 3, madPermille: Int = 200)
      : DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(minGaps >= 1, "minGaps must be >= 1")
    require(madPermille > 0 && madPermille <= 1000,
      "madPermille must be in (0, 1000]")
    // the output attaches these four: a same-named KEY column would make
    // the result ambiguous to select from (the Anomaly clash rule)
    val clash = Seq("n_gaps", "median_gap_us", "mad_gap_us", "is_beacon")
      .filter(keyCols.contains)
    require(clash.isEmpty,
      s"key column(s) ${clash.mkString(", ")} collide with the output " +
        "statistics — rename them (detect attaches n_gaps/median_gap_us/" +
        "mad_gap_us/is_beacon)")
    val keys = keyCols.map(col)
    val part = Window.partitionBy(keys: _*)
    val arrival = part.orderBy(col("__graft_tus").asc, col(tieCol).asc)

    val gaps = events
      .where(col(tsCol).isNotNull)
      // cast: the table may carry TIMESTAMP_NTZ; with the session tz
      // pinned to UTC the NTZ->LTZ cast is instant-preserving
      .withColumn("__graft_tus", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__graft_gap",
        col("__graft_tus") - lag(col("__graft_tus"), 1).over(arrival))
      .where(col("__graft_gap").isNotNull)
      .select(keys :+ col("__graft_gap").as("gap_us"): _*)

    // nearest-rank median of the gaps, then of the absolute deviations —
    // the Anomaly mechanism: both sorts re-sort the SAME key partitions
    def medianOf(in: DataFrame, c: String, out: String): DataFrame = {
      val w = part.orderBy(col(c).asc)
      in.withColumn("__graft_rk", row_number().over(w))
        .withColumn("__graft_n", count(lit(1)).over(part))
        .withColumn(out, max(when(col("__graft_rk") ===
          expr("(500 * __graft_n + 999) div 1000"), col(c))).over(part))
        .drop("__graft_rk", "__graft_n")
    }
    val withMed = medianOf(gaps, "gap_us", "__graft_med")
      .withColumn("__graft_dev", abs(col("gap_us") - col("__graft_med")))
    val withMad = medianOf(withMed, "__graft_dev", "__graft_mad")

    withMad.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_gaps"),
        max(col("__graft_med")).as("median_gap_us"),
        max(col("__graft_mad")).as("mad_gap_us"))
      .withColumn("is_beacon",
        col("n_gaps") >= lit(minGaps.toLong) &&
          col("median_gap_us") > lit(0L) &&
          col("mad_gap_us") * lit(1000L) <=
            col("median_gap_us") * lit(madPermille.toLong))
  }
}
