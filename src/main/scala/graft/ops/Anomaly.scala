package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-key anomaly flags via median absolute deviation (MAD) —
  * the telemetry outlier detector that pairs with the SLA percentiles
  * ([[Percentiles]]): flag every measurement whose absolute deviation
  * from its group's median exceeds `k` times the group's MAD
  * (median of |value - median|). MAD rather than z-scores deliberately:
  * mean/stddev are float SUMS whose value depends on reduction order
  * (never bit-reproducible across engines or even across runs), and the
  * outliers themselves drag the mean toward them. Medians are
  * NEAREST-RANK (the [[Percentiles]] rule, pure integer rank
  * arithmetic) so both statistics are actual data values, and the only
  * float ops are one IEEE subtraction, one multiplication, and one
  * compare — each bit-identical in any IEEE-754 engine, so the flag set
  * is engine-exact.
  *
  * Shape: ONE hash shuffle on the group key. The median rides a
  * (key, value)-sorted window pass; the deviation median rides a second
  * sort of the SAME partitions (no second exchange — spec-asserted);
  * the group-wide median/MAD values fan back per-row through unbounded
  * max-over-partition windows, not a self-join. A pathologically hot
  * key sorts inside one task — the same bound as any per-entity window.
  *
  * `k` is integer PERMILLE (3000 = the classic 3×MAD rule): the
  * threshold multiply is then `mad * kPermille / 1000.0`, the identical
  * literal expression on every engine. A group whose MAD is 0 (at least
  * half its values equal the median) flags exactly the values with any
  * nonzero deviation when k > 0 — the degenerate-spread behavior a
  * constant-metric stream wants (any departure from the flatline is
  * anomalous).
  */
object Anomaly {

  /** Rows of `df` flagged as outliers, with `group_median`, `group_mad`,
    * and `abs_dev` attached. NULL measurements are never flagged and do
    * not participate in either median.
    */
  def madOutliers(df: DataFrame, keyCols: Seq[String], valCol: String,
      kPermille: Int = 3000): DataFrame = {
    require(kPermille > 0, "kPermille must be positive")
    // the output attaches these three: silently replacing a caller's
    // same-named column (plausible after an upstream stats pass) would
    // hand downstream readers OUR intermediate as THEIR data
    val clash = Seq("group_median", "group_mad", "abs_dev")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename " +
        "them (madOutliers attaches group_median/group_mad/abs_dev)")
    val keys = keyCols.map(col)
    val part = Window.partitionBy(keys: _*)
    def medianOf(in: DataFrame, c: String, out: String): DataFrame = {
      val w = part.orderBy(col(c).asc)
      in.withColumn("__graft_rk", row_number().over(w))
        .withColumn("__graft_n", count(lit(1)).over(part))
        .withColumn(out, max(when(col("__graft_rk") ===
          expr("(500 * __graft_n + 999) div 1000"), col(c))).over(part))
        .drop("__graft_rk", "__graft_n")
    }
    val withMed = medianOf(df.where(col(valCol).isNotNull),
      valCol, "group_median")
      .withColumn("abs_dev", abs(col(valCol) - col("group_median")))
    medianOf(withMed, "abs_dev", "group_mad")
      .where(col("abs_dev") > col("group_mad") * lit(kPermille) / lit(1000.0))
  }
}
