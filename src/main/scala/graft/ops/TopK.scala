package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diversified exact top-K — "the K best rows overall, but at most
  * `perGroup` from any one group": feed ranking that one hot source
  * cannot monopolize, eval-set selection capped per domain, the
  * curation shortlist with a per-cluster quota. Plain top-K then
  * post-filtering by group is WRONG (a group-capped slot must be
  * refilled by the next-best row from elsewhere); this op applies the
  * quota first — rank within group, keep rank ≤ perGroup — and only
  * then takes the global K, which provably yields the maximum-score
  * feasible set (swapping any excluded row in would either break its
  * group's quota or evict a better row).
  *
  * Both stages are bounded: the within-group rank sorts per group (and
  * only the top `perGroup` survive it), the global stage is
  * TakeOrdered over the quota survivors (≤ perGroup × |groups| rows),
  * never a full sort. Order is pinned (score DESC, id ASC) at both
  * stages — id must be unique, so the selected SET is a pure function
  * of the input, engine-replayable. NULL scores cannot rank (dropped,
  * like [[Dedup.keepBest]]); NULL groups are a real group with its own
  * quota.
  */
object TopK {

  /** (rank, idCol, groupCol, scoreCol) for the diversified top-k. */
  def diversifiedTopK(df: DataFrame, scoreCol: String, idCol: String,
      groupCol: String, perGroup: Int, k: Int): DataFrame = {
    require(perGroup >= 1 && k >= 1, "perGroup and k must be >= 1")
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    val inGroup = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    Ranked.rankedTopK(
      df.filter(col(scoreCol).isNotNull)
        .withColumn("__graft_gr", row_number().over(inGroup))
        .filter(col("__graft_gr") <= perGroup),
      order, k, "rank")
      .select(col("rank"), col(idCol), col(groupCol), col(scoreCol))
  }
}
