package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based BATCH sessionization of an event/telemetry table — the
  * canonical log-pipeline rollup (the streaming analog with watermarked
  * state lives in streaming/StreamingScan's conversation-state path):
  * within each user, an event starts a new session when it is the user's
  * first event or follows the previous one by more than `gapSeconds`;
  * `session_idx` is the running count of such boundaries.
  *
  * Determinism: the per-user ordering key is the timestamp alone. Two
  * events with the SAME (user, ts) cannot straddle a boundary (their gap
  * is 0), so their relative order never changes any row's session_idx —
  * the assignment is a pure function of the multiset of timestamps even
  * though the window order between equal timestamps is not fixed.
  * Integer microsecond arithmetic (`unix_micros`), no float time math.
  *
  * 100 TB shape: ONE hash-shuffle on the user key; the lag window and the
  * running sum ride the same sort, and a downstream
  * groupBy(user, session_idx) reuses the partitioning (a hash
  * partitioning on `user` satisfies the clustered distribution of
  * (user, session_idx)), so [[stats]] adds no second exchange. A
  * pathologically hot user sorts inside one task — the same bound as any
  * per-entity window; pre-split such entities upstream if one entity
  * exceeds a task.
  */
object Sessionize {

  /** Input rows + `session_idx` (1-based within each user). */
  def assign(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc)
    // .cast("timestamp") because parquet tables surface TIMESTAMP_NTZ,
    // which unix_micros rejects (the Conversations.stats span convention);
    // both sides of the difference shift identically under the session tz
    val boundary = when(
      col("__graft_prev").isNull ||
        unix_micros(col(tsCol).cast("timestamp")) -
          unix_micros(col("__graft_prev").cast("timestamp")) >
          gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__graft_prev", lag(tsCol, 1).over(w))
      .withColumn("__graft_nb", boundary)
      .withColumn("session_idx",
        sum("__graft_nb").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__graft_prev", "__graft_nb")
  }

  /** Per-session rollup: event count, start/end, plus caller-supplied
    * aggregates (e.g. an integer-cents value sum — float sums are
    * order-dependent and would not reproduce across engines).
    */
  def stats(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      extraAggs: Seq[Column] = Nil): DataFrame =
    assign(events, gapSeconds, userCol, tsCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (min(col(tsCol)).as("session_start") +:
          max(col(tsCol)).as("session_end") +:
          extraAggs): _*)
}
