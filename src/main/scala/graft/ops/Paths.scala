package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top session paths — the product-analytics "what journeys actually
  * happen" rollup: the ordered sequence of event types in each session
  * (capped at the first `maxLen` — journey PREFIXES, the stable unit
  * when sessions have long tails), counted across sessions, top-K. The
  * whole-path complement to [[Transitions]]' bigram view: transitions
  * say error follows click 12% of the time; paths say the third most
  * common journey IS view>click>error.
  *
  * Bounded state by construction: events rank within their session and
  * everything past `maxLen` is FILTERED before any collection, so the
  * per-group array never holds more than `maxLen` entries no matter how
  * degenerate a session is — the `collect_list` equivalent without the
  * unbounded-group hazard. Path assembly is deterministic: the
  * collected (rank, type) pairs are `array_sort`ed before joining (a
  * bare collect_list order is partition-dependent), and rank comes
  * from caller-supplied `orderCols` that must make the order unique
  * (include an event id; ties would otherwise make the path
  * nondeterministic). NULL types render as the literal `(null)` —
  * `array_join`/`string_agg` silently DROP nulls, which would alias
  * "a>(null)>b" with "a>b".
  *
  * 100 TB: one hash-shuffle on the session key (per-session sort, gap-
  * bounded by sessionization); path counting is a map-side-partial
  * aggregate; top-K is TakeOrdered (distributed partial top-K, no full
  * sort). Ties rank by path ascending — pinned, engine-replayable.
  */
object Paths {

  /** (path_rank, path, n_sessions) for the topK most common
    * `maxLen`-prefix paths over (entityCols…) sessions ordered by
    * (orderCols…). */
  def topPaths(events: DataFrame, entityCols: Seq[String],
      orderCols: Seq[String], typeCol: String, maxLen: Int,
      topK: Int): DataFrame = {
    require(entityCols.nonEmpty, "at least one entity column")
    require(orderCols.nonEmpty, "at least one order column")
    require(maxLen >= 1 && topK >= 1, "maxLen and topK must be >= 1")
    val w = Window.partitionBy(entityCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val perEntity = events
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= maxLen)
      .withColumn("__graft_t",
        coalesce(col(typeCol).cast("string"), lit("(null)")))
      .groupBy(entityCols.map(col): _*)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__graft_rn").as("r"),
          col("__graft_t").as("t")))),
        x => x.getField("t")), ">").as("path"))
    Ranked.rankedTopK(
      perEntity.groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions")),
      Seq(col("n_sessions").desc, col("path").asc), topK, "path_rank")
      .select("path_rank", "path", "n_sessions")
  }
}
