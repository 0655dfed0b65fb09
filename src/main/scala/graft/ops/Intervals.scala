package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval merging — collapse overlapping/adjacent spans into
  * their union: incident windows from overlapping alerts, user activity
  * spans from session fragments, maintenance windows from per-service
  * tickets. The classical sweep, expressed relationally so it runs as
  * ONE key exchange + a per-key sorted window pass (the [[Sessionize]]
  * shape — boundaries from a running comparison, groups from a running
  * sum), never a self-join: the naive "interval overlaps interval"
  * theta-join is quadratic per key and a 10^5-alert incident would pay
  * 10^10 comparisons for an answer the sweep gets in one ordered scan.
  *
  * Semantics: half-open [start, end) in exact integer units
  * (microseconds, the repo's timestamp rule); intervals with
  * `start > end` are REJECTED loudly (a silently swapped pair would
  * merge everything it touches); `touching = true` (default) also
  * merges back-to-back spans (end == next start — the natural reading
  * for half-open spans). A new group starts where the running maximum
  * of previous ends is strictly less than (or, with touching = false,
  * does not exceed) the next start — the running MAX matters: a long
  * interval can bridge past its immediate successor, so comparing
  * against `lag(end)` alone (the common bug) splits spans a bridge
  * covers. Ordering ties on (start, end) make group boundaries
  * deterministic for any input layout.
  *
  * Output: one row per merged span — keys…, start, end, n_merged.
  */
object Intervals {

  def mergeIntervals(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String, touching: Boolean = true): DataFrame = {
    val s = col(startCol)
    val e = col(endCol)
    // the guard rides INSIDE the end column it validates — a separate
    // check column would be dead code Catalyst prunes away, and the
    // raise_error with it
    val checked = df
      .where(s.isNotNull && e.isNotNull)
      .withColumn(endCol,
        when(s <= e, e).otherwise(raise_error(concat(
          lit(s"mergeIntervals: $startCol > $endCol for ("),
          s.cast("string"), lit(", "), e.cast("string"), lit(")")))))
    val order = Window.partitionBy(keys.map(col): _*)
      .orderBy(s.asc, e.asc)
    val prevMax = max(e).over(
      order.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMax.isNull, lit(1))
      .when(if (touching) prevMax < s else prevMax <= s, lit(1))
      .otherwise(lit(0))
    val grouped = checked
      .withColumn("__graft_new", isNew)
      .withColumn("__graft_grp", sum(col("__graft_new")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped.groupBy((keys.map(col) :+ col("__graft_grp")): _*)
      .agg(min(s).as(startCol), max(e).as(endCol),
        count(lit(1)).as("n_merged"))
      .drop("__graft_grp")
  }
}
