package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Actor-concentration audit — per group, how dominated is activity by
  * few actors? The Gini coefficient of the per-actor volume
  * distribution, EXACT: the sorted-cumulative identity
  * `G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)` over ascending per-actor
  * counts — integer numerator and denominator (permille rendered with
  * integral div), no IEEE accumulation, and tie-order-invariant
  * (swapping equal x's permutes ranks without changing Σ i·x, so no
  * tie pinning is even needed). G=0 is perfectly uniform, →1 is one
  * actor owning everything; alongside it, `top1_permille` (the
  * largest actor's share) answers the triager's first question
  * directly. The skew lens one level up from [[SkewJoin.diagnose]]:
  * diagnose asks "should this JOIN be salted", this asks "is this
  * feed/type structurally a few-actor stream" — a monitoring number,
  * trended over time via [[Scd]]/[[SnapshotDiff]].
  *
  * Scale shape: the corpus folds to per-(group, actor) counts first
  * (map-side partial, histogram-sized — the dedup-before-expensive
  * rule), and the rank window sorts THAT, bounded by actors per
  * group, never events. Products ride decimal(38,0): `Σ i·x ≤
  * n·Σx ≈ 10^9 actors × 10^12 events = 10^21`, past a long. NULL
  * actors are a real actor bucket (the hot-NULL rule); groups with
  * one actor have G = 0/Σx = 0 (no inequality measurable between
  * fewer than two actors — and the formula says exactly that).
  */
object Concentration {

  /** One row per group: (groupCols…, n_actors, n_events,
    * gini_permille, top1_permille). */
  def actorConcentration(events: DataFrame, groupCols: Seq[String],
      actorCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val counts = events
      .groupBy((groupCols :+ actorCol).map(col): _*)
      .agg(count(lit(1)).as("__graft_x"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__graft_x").asc, col(actorCol).asc_nulls_first)
    counts
      .withColumn("__graft_i", row_number().over(w))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_actors"),
        sum(col("__graft_x")).as("n_events"),
        sum(expr("CAST(__graft_i AS DECIMAL(38,0)) * __graft_x"))
          .as("__graft_ix"),
        max(col("__graft_x")).as("__graft_max"))
      .withColumn("gini_permille", expr(
        "(2 * __graft_ix - (n_actors + 1) * CAST(n_events AS" +
          " DECIMAL(38,0))) * 1000 div" +
          " (CAST(n_actors AS DECIMAL(38,0)) * n_events)"))
      .withColumn("top1_permille",
        expr("__graft_max * 1000 div n_events"))
      .select((groupCols.map(col) ++ Seq(col("n_actors"),
        col("n_events"), col("gini_permille"),
        col("top1_permille"))): _*)
  }
}
