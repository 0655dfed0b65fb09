package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUSUM change-point detection — the drift detector above the hourly /
  * daily rollups: a plain threshold on per-period counts misses a SLOW
  * upward drift (each period looks normal), while the one-sided CUSUM
  * statistic S_i = max(0, S_{i-1} + x_i - drift) accumulates every
  * period's excess over the tolerated rate and fires when the
  * accumulated evidence crosses `threshold`. This is Page's classic
  * sequential test with integer arithmetic throughout — drift and
  * threshold are integers, S is an exact long — so two engines replay
  * it bit-for-bit (no mean/variance estimation inside the op; callers
  * pick drift from their own baseline, e.g. a prior-week median).
  *
  * 100 TB shape: ONE hash shuffle on the series key, then a streaming
  * per-key scan over Spark's spill-friendly sorted iterator — O(1)
  * memory per task, no per-group buffering, keys never split across
  * tasks (hash partitioning). Same mechanics as
  * [[Packing.packSequences]].
  */
object ChangePoint {

  /** One row per input period: (key, period, value, cusum, alarm).
    * Scan per key in (period, value) order — the value tie-break pins
    * determinism if a key ever carries duplicate periods (upstream
    * should aggregate; the scan stays well-defined either way).
    * NULL keys are dropped (no series identity); NULL values count 0
    * (a missing period's observation is no evidence either way).
    *
    * @param drift     tolerated per-period level (the "k" slack): only
    *                  the excess over it accumulates
    * @param threshold alarm when the accumulated excess reaches it
    */
  def cusum(series: DataFrame, drift: Long, threshold: Long,
      keyCol: String = "key", periodCol: String = "period",
      valueCol: String = "value"): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val s = series.sparkSession
    import s.implicits._
    series.select(
      col(keyCol).cast("string").as("key"),
      col(periodCol).cast("long").as("period"),
      coalesce(col(valueCol).cast("long"), lit(0L)).as("value"))
      .where(col("key").isNotNull)
      .as[(String, Long, Long)]
      .repartition(col("key"))
      .sortWithinPartitions("key", "period", "value")
      .mapPartitions { it =>
        var curKey: String = null
        var stat = 0L
        it.map { case (key, period, v) =>
          if (key != curKey) { curKey = key; stat = 0L }
          stat = math.max(0L, stat + v - drift)
          (key, period, v, stat, stat >= threshold)
        }
      }.toDF("key", "period", "value", "cusum", "alarm")
  }
}
