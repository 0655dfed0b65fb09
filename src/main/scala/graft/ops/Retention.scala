package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention — the telemetry rollup that pairs with funnels and
  * sessionization: bucket users by the week of their FIRST event (their
  * cohort), then count how many of each cohort were active again N weeks
  * later. Output is the retention matrix (cohort_week, week_offset,
  * users).
  *
  * Weeks are pure integer arithmetic — epoch-microseconds div one week
  * (604 800 000 000 µs) — NOT calendar `date_trunc('week')`: the integer
  * form is engine-exact by construction (no Monday-vs-Sunday week-start
  * or locale question), and retention only needs consistent bucketing,
  * not calendar alignment. The epoch anchor (day 0 = a Thursday) is the
  * same constant everywhere.
  *
  * 100 TB shape: ONE hash shuffle on the user key — per-user weekly
  * activity dedups under hashpartitioning(user) (a groupBy(user, week)
  * is satisfied by the user partitioning), the cohort week fans back
  * through an unbounded min-window on the same partitions — then the
  * final (cohort, offset) aggregate counts user-distinct rows that are
  * ALREADY distinct by construction, so it is a plain count, not a
  * count-distinct re-shuffle. No joins, no self-join.
  */
object Retention {

  /** `(cohort_week, week_offset, users)` — users from cohort
    * `cohort_week` active in week `cohort_week + week_offset`;
    * `week_offset` 0 row = cohort size. NULL users dropped (no identity,
    * no cohort — the [[Sampling]] null-id verdict); NULL timestamps
    * carry no week and are ignored.
    */
  def matrix(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    // integer `div`, not `/`: Column `/` is DOUBLE division, and a
    // truncating cast back would ride float rounding at week boundaries
    val week = expr(
      s"unix_micros(cast(`$tsCol` as timestamp)) div 604800000000")
    // explicit repartition on the user key: HashPartitioning(u) satisfies
    // BOTH the (u, week) dedup's clustering (subset rule) and the cohort
    // window's — without it Spark's ENSURE_REQUIREMENTS inserts a
    // separate (u, week) exchange before the window's u exchange
    // (verified: 3 exchanges planned vs 2; review-pass-11 follow-up)
    val weekly = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__graft_u"), week.as("week"))
      .repartition(col("__graft_u"))
      .dropDuplicates("__graft_u", "week")
    val withCohort = weekly.withColumn("cohort_week",
      min(col("week")).over(Window.partitionBy(col("__graft_u"))))
    withCohort
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
  }
}
