package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — how many users reached each step of an
  * ordered sequence (view → click → purchase), with arbitrary other
  * events interleaved: the conversion rollup of the telemetry family.
  * GREEDY matching (each step matches at its earliest occurrence after
  * the previous step's match), the standard funnel semantic: greedy
  * maximizes reach for 2 steps and is the deterministic, explainable
  * convention every funnel product uses.
  *
  * Determinism: events order by (ts, idCol) — a total order, so users
  * with equal timestamps (bursts, batch imports) still fold identically
  * on every engine and every run. The fold itself is integer position
  * arithmetic over the per-user event-type array (array_position over a
  * slice), all codegen'd builtins, no UDF.
  *
  * 100 TB shape: non-step events are dropped BEFORE the shuffle (greedy
  * matching depends only on the step events' relative order, so the
  * counts are identical and the shuffle shrinks by the non-step share —
  * 3 steps out of hundreds of event types is the common case), then ONE
  * hash shuffle on the user key building the per-user ordered array
  * (collect_list with map-side partial aggregation), then a scalar
  * reduce (one count row per partition). The per-user array is the same
  * per-entity working-set bound as sessionization — a user's own step
  * history fits a task; pre-split pathological entities upstream. Steps
  * are matched map-side after the shuffle; adding steps adds
  * projections, never passes.
  */
object Funnel {

  /** One row per step: `(step_idx, step, users)` — users whose ordered
    * event stream contains the step sequence up to and including
    * `step_idx` (so `users` is non-increasing in `step_idx`; an empty
    * input yields 0 per step, never NULL). NULL event types can never
    * match a step; NULL users are DROPPED — conflating every anonymous
    * event into one phantom "user" whose unrelated events complete the
    * funnel would inflate each step count (the same no-identity-no-
    * membership verdict as [[Sampling]]'s null-id rule).
    */
  def reachedCounts(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    require(steps.distinct.size == steps.size,
      "repeated step names are ambiguous under greedy matching — " +
        "disambiguate upstream (e.g. suffix occurrence numbers)")
    val ordered = events
      .where(col(userCol).isNotNull && col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(struct(col(tsCol).as("__graft_ts"),
        col(idCol).as("__graft_id"), col(typeCol).as("__graft_t"))))
        .as("__graft_evs"))
      .select(transform(col("__graft_evs"),
        e => e.getField("__graft_t")).as("__graft_types"))
    // greedy absolute 1-based match positions; -1 = step (or an earlier
    // step) never reached. The slice start clamps via greatest() so the
    // dead branch stays evaluable; the when() forces -1 through anyway.
    val withPos = steps.zipWithIndex
      .foldLeft(ordered.withColumn("__graft_p0", lit(0L))) {
        case (df, (step, i)) =>
          val prev = col(s"__graft_p$i")
          val rel = array_position(
            slice(col("__graft_types"),
              (greatest(prev, lit(0L)) + 1).cast("int"),
              size(col("__graft_types"))), step)
          df.withColumn(s"__graft_p${i + 1}",
            when(prev >= 0 && rel > 0, prev + rel).otherwise(lit(-1L)))
      }
    // coalesce: a global sum over zero rows is NULL — an empty day
    // partition must read 0 reached, not NULL (review find)
    val aggs = steps.indices.map(i =>
      coalesce(sum(when(col(s"__graft_p${i + 1}") > 0, 1L).otherwise(0L)),
        lit(0L)).as(s"__graft_s${i + 1}"))
    val one = withPos.agg(aggs.head, aggs.tail: _*)
    // typed unpivot — no SQL string assembly, so step names with quotes,
    // backslashes, or newlines survive verbatim (review find)
    one.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step_idx"), lit(s).as("step"),
        col(s"__graft_s${i + 1}").as("users"))
    }: _*)).as("__graft_row"))
      .select(col("__graft_row.step_idx").as("step_idx"),
        col("__graft_row.step").as("step"),
        col("__graft_row.users").as("users"))
  }
}
