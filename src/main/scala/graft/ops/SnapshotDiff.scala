package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — change capture between two versions of the
  * same table: yesterday's threat feed vs today's, last week's routed
  * sink vs the backfill, any slowly-changing dimension. Where
  * [[Reconcile.diff]] answers "are these multisets equal, and in which
  * groups" (digest-level, for 10^12-row equality checks), this op
  * answers the row-level question: WHICH keys were added, removed, or
  * changed — and for changed rows, which COLUMNS moved (the payload an
  * incident review or feed-update audit actually reads).
  *
  * Semantics: one FULL OUTER hash equi-join on the keys; presence is
  * tracked by explicit marker columns, never by "key column is null"
  * (a snapshot row whose compare columns are all NULL is still
  * present). Column comparison is null-safe (`<=>`): NULL → value is a
  * change, NULL → NULL is not. `changed_cols` is a comma-joined list
  * in caller column order (concat_ws skips the non-changed NULLs —
  * identical semantics in ANSI engines, which keeps the op
  * oracle-gateable; an array column would hash differently across
  * engines' parquet writers). Unchanged rows are EXCLUDED by default
  * (at 10^12 rows the unchanged set is the table; the diff is the
  * product) — `includeUnchanged = true` keeps them for small audits.
  *
  * Keys must be unique per snapshot (it is a snapshot, not a log);
  * duplicate keys would cross-multiply in the join, so they are
  * REJECTED loudly via a pre-join uniqueness guard on each side —
  * costing one aggregate per side, the price of not silently emitting
  * a wrong diff.
  */
object SnapshotDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compare column")

    def guarded(df: DataFrame, side: String): DataFrame = {
      // uniqueness guard folded into a used column (the Intervals
      // rule: a free-standing check column is dead code)
      val dups = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__graft_dup"))
        .where(col("__graft_dup") > 1)
      df.join(broadcast(dups.limit(1)
          .select(keys.map(col) :+ col("__graft_dup"): _*)),
          keys, "left")
        .withColumn("__graft_present",
          when(col("__graft_dup").isNull, lit(true))
            .otherwise(raise_error(concat(
              lit(s"SnapshotDiff: duplicate key in $side snapshot: "),
              concat_ws(",", keys.map(k => col(k).cast("string")): _*)))))
        .drop("__graft_dup")
    }

    val o = guarded(oldDf, "old").select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"__graft_o_$c"))
        :+ col("__graft_present").as("__graft_o_present"): _*)
    val n = guarded(newDf, "new").select(
      keys.map(col) ++ compareCols.map(c => col(c).as(s"__graft_n_$c"))
        :+ col("__graft_present").as("__graft_n_present"): _*)

    val joined = o.join(n, keys, "full_outer")
    val colChanged: Seq[Column] = compareCols.map { c =>
      when(!(col(s"__graft_o_$c") <=> col(s"__graft_n_$c")), lit(c))
    }
    val bothPresent = col("__graft_o_present").isNotNull &&
      col("__graft_n_present").isNotNull
    val changedCols = when(bothPresent,
      concat_ws(",", colChanged: _*)).otherwise(lit(""))
    val verdict = when(col("__graft_o_present").isNull, lit("added"))
      .when(col("__graft_n_present").isNull, lit("removed"))
      .when(changedCols =!= "", lit("changed"))
      .otherwise(lit("unchanged"))
    val out = joined
      .withColumn("verdict", verdict)
      .withColumn("changed_cols", changedCols)
      .drop("__graft_o_present", "__graft_n_present")
    val outCols: Seq[Column] = keys.map(col) ++
      Seq(col("verdict"), col("changed_cols")) ++
      compareCols.map(c => col(s"__graft_o_$c").as(s"old_$c")) ++
      compareCols.map(c => col(s"__graft_n_$c").as(s"new_$c"))
    (if (includeUnchanged) out
     else out.where(col("verdict") =!= "unchanged"))
      .select(outCols: _*)
  }
}
