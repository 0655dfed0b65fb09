package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact NEAREST-RANK percentiles per group — the telemetry/SLA rollup
  * (p50/p95/p99 latency per endpoint). Nearest-rank (the value at rank
  * ceil(p*n), 1-based) rather than linear interpolation, deliberately:
  * interpolated percentiles are a float FORMULA — (1-f)*a + f*b vs
  * a + f*(b-a) differ in final-ulp rounding across engines — while
  * nearest-rank SELECTS an actual data value, so any engine agrees
  * bit-exactly and the result is always a value that really occurred.
  *
  * Percentiles are INTEGER PERMILLE (p95 = 950): the rank is then the
  * pure integer ceil((permille * n) / 1000) = (permille*n + 999) div
  * 1000. A double `ceil(p * n)` is an off-by-one trap — 0.95*40 is
  * 38.000000000000001 in IEEE and ceils to 39 — and which groups it
  * mis-ranks depends on n, silently and engine-consistently wrong.
  *
  * Shape: one hash-shuffle on the group key + a per-group sort; all
  * requested percentiles ride ONE window pass (row_number + group count
  * over the same sort), then a map-side aggregate picks the ranked rows.
  * Ties: equal values make the picked RANK arbitrary among them but the
  * picked VALUE identical, so the output is deterministic. NULL
  * measurements carry no rank and are excluded from n.
  */
object Percentiles {

  /** One row per group: `keyCols..., p_<label>` per requested permille. */
  def nearestRank(df: DataFrame, keyCols: Seq[String], valCol: String,
      ps: Seq[(String, Int)]): DataFrame = {
    require(ps.nonEmpty, "at least one percentile")
    require(ps.forall { case (_, p) => p > 0 && p <= 1000 },
      "percentile permille must be in (0, 1000]")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(valCol).asc)
    val ranked = df
      .where(col(valCol).isNotNull)
      .withColumn("__graft_rk", row_number().over(w))
      .withColumn("__graft_n",
        count(lit(1)).over(Window.partitionBy(keys: _*)))
    val aggs: Seq[Column] = ps.map { case (label, p) =>
      max(when(col("__graft_rk") ===
        expr(s"($p * __graft_n + 999) div 1000"), col(valCol)))
        .as(s"p_$label")
    }
    ranked.groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
