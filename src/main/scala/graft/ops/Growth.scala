package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting: per integer period, how many entities were active,
  * how many were NEW (first-ever activity), how many RETURNING, and the
  * cumulative count of entities ever seen — the DAU/WAU "new vs
  * returning" curve every telemetry stack reports.
  *
  * Periods are pure integer arithmetic (epoch-micros div `periodMicros`),
  * the Retention.matrix convention: engine-exact, no calendar/week-start
  * ambiguity.
  *
  * 100 TB shape: ONE hash shuffle on the entity key — the explicit
  * repartition lets the (entity, period) dedup (subset rule) and the
  * first-period min-window share one exchange, exactly the Retention
  * plan. Everything after operates on one row per (entity, active
  * period); the final per-period aggregate and the cumulative sum run
  * over |periods| rows — tiny. The cumulative window is a single
  * unpartitioned sort of that tiny table, never of the corpus. NULL
  * entities/timestamps carry no identity/position and are dropped (the
  * Funnel/Sampling phantom-user rule).
  */
object Growth {

  /** `(period, active, new_entities, returning, cumulative_entities)`,
    * one row per period with activity; `active = new + returning`.
    */
  def newVsReturning(events: DataFrame, entityCol: String = "user_id",
      tsCol: String = "ts",
      periodMicros: Long = 86400000000L): DataFrame = {
    require(periodMicros > 0, "periodMicros must be positive")
    val period = expr(
      s"unix_micros(cast(`$tsCol` as timestamp)) div ${periodMicros}L")
    val perEntityPeriod = events
      .where(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .select(col(entityCol).as("__graft_e"), period.as("period"))
      .repartition(col("__graft_e"))
      .dropDuplicates("__graft_e", "period")
      .withColumn("__graft_first",
        min("period").over(Window.partitionBy("__graft_e")))
    val perPeriod = perEntityPeriod
      .groupBy("period")
      .agg(count(lit(1)).as("active"),
        sum(when(col("period") === col("__graft_first"), 1L)
          .otherwise(0L)).as("new_entities"))
      .withColumn("returning", col("active") - col("new_entities"))
    // |periods| rows: the unpartitioned running sum is a one-task sort
    // of a tiny table (same trade as Retention's final matrix aggregate)
    perPeriod.withColumn("cumulative_entities",
      sum("new_entities").over(Window.orderBy("period")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
