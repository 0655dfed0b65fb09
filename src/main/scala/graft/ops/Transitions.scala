package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order transition (bigram) statistics over per-entity ordered
  * event streams: for each entity, pair every event's type with the
  * previous event's type, then count each (prev, next) transition and its
  * conditional probability P(next | prev). The telemetry "what follows
  * what" rollup — error-after-click rates, tool-after-tool patterns in
  * agent transcripts, Markov-chain session models.
  *
  * Determinism: the per-entity order is (orderCols...) — callers include
  * a unique column (event id) so equal timestamps have a fixed order and
  * the bigram multiset is a pure function of the input. The probability
  * is one IEEE double division of two exact longs (n / total), identical
  * bit-for-bit on any engine.
  *
  * 100 TB shape: one hash-shuffle on the entity key for the lag window;
  * the (prev, next) count is a map-side-partial aggregate whose key
  * cardinality is |types|² — tiny — so the second exchange moves almost
  * nothing; the per-prev totals ride a window over that tiny aggregate
  * rather than a second pass over the events. A hot entity sorts inside
  * one task — the standard per-entity window bound.
  */
object Transitions {

  /** (prev_type, next_type, n, p) for every adjacent pair within an
    * entity, ordered rows only (an entity's first event starts no
    * transition).
    */
  def bigramCounts(events: DataFrame, entityCol: String = "user_id",
      typeCol: String = "event_type",
      orderCols: Seq[Column] = Seq(col("ts"), col("event_id"))): DataFrame = {
    require(orderCols.nonEmpty,
      "bigramCounts needs at least one order column")
    val w = Window.partitionBy(entityCol).orderBy(orderCols: _*)
    val counts = events
      // NULL entities are not ONE anonymous user — their interleaved
      // events would mint transitions no real entity made (the Funnel/
      // Sampling phantom-user rule). NULL order keys have no position in
      // the stream (and engines disagree on null sort order), so those
      // rows are dropped too rather than placed arbitrarily.
      .where(col(entityCol).isNotNull &&
        orderCols.map(_.isNotNull).reduce(_ && _))
      .withColumn("__graft_prev", lag(col(typeCol), 1).over(w))
      .where(col("__graft_prev").isNotNull)
      .groupBy(col("__graft_prev").as("prev_type"),
        col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val perPrev = Window.partitionBy("prev_type")
    counts.withColumn("p",
      col("n").cast("double") / sum("n").over(perPrev).cast("double"))
  }
}
