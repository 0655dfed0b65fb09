package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join: match each point row to the interval rows
  * whose `[start, end)` contains its timestamp (optionally also equi-
  * matching key columns) — "which maintenance window / deploy / incident
  * was this event inside". Spark has no native interval join: the naive
  * `p.ts >= i.start AND p.ts < i.end` theta join plans
  * BroadcastNestedLoopJoin and re-scans one side per row of the other.
  *
  * Spark-first plan: quantize time into fixed buckets of `bucketMicros`.
  * A point lives in exactly ONE bucket; an interval is exploded to every
  * bucket it overlaps. The join is then a plain hash equi-join on
  * (keys..., bucket) with the exact range predicate as a residual
  * filter — shuffled, AQE-eligible, linear in |points| + |exploded
  * intervals|. Because each point has one bucket, a (point, interval)
  * pair can meet in at most one bucket: no duplicate pairs, no dedup
  * pass.
  *
  * Interval semantics are half-open `[start, end)` (an event AT the end
  * timestamp is outside); empty or negative intervals match nothing.
  * NULL timestamps/bounds never match (their bucket key is NULL, which a
  * hash equi-join never matches — the SQL comparison semantics for
  * free). With `how = "left"`, points inside no interval survive with
  * NULL interval columns.
  *
  * 100 TB shape: pick `bucketMicros` near the TYPICAL interval length so
  * most intervals explode to ~2 buckets. The explosion factor is
  * (len / bucket + 2); a pathological interval (a "window" spanning the
  * whole retention period) would silently fan out to millions of rows,
  * so `maxBucketsPerInterval` (default 10k — defaults-ON per the skew-
  * guard rule) raises a LOUD distributed error instead of exploding;
  * pass 0 to opt out. Hot buckets (many intervals overlapping one
  * moment) are ordinary join skew — AQE's skew-join split applies.
  */
object IntervalJoin {

  /** @param points    rows with `pointTs`; all columns pass through
    * @param intervals rows with `startCol`/`endCol`; all columns pass
    *                  through (they must not collide with point columns)
    * @param keys      equi-join key columns present on BOTH sides
    *                  (e.g. user_id); empty = time-only join
    * @param how       "inner" or "left" (left keeps unmatched points)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String] = Nil, pointTs: String = "ts",
      startCol: String = "start", endCol: String = "end",
      bucketMicros: Long = 3600000000L,
      maxBucketsPerInterval: Long = 10000L,
      how: String = "inner"): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    require(how == "inner" || how == "left",
      s"how must be inner|left, got $how")
    val dupCols = intervals.columns.toSet
      .intersect(points.columns.toSet) -- keys
    require(dupCols.isEmpty,
      s"interval columns collide with point columns: " +
        dupCols.toSeq.sorted.mkString(", "))
    require(!points.columns.contains("__graft_bucket") &&
      !intervals.columns.contains("__graft_bucket"),
      "__graft_bucket is reserved")

    // integer `div`, not `/` (Column `/` is DOUBLE division; trunc-div is
    // monotone, so a point's bucket always lies in [startB, endB])
    def bucketOf(tsSql: String) =
      expr(s"unix_micros(cast($tsSql as timestamp)) div ${bucketMicros}L")

    val p = points.withColumn("__graft_bucket", bucketOf(s"`$pointTs`"))
    // half-open [start, end): the last bucket is the one holding end-1µs,
    // so an interval ending exactly on a bucket boundary does not explode
    // into a bucket it cannot match
    val startB = bucketOf(s"`$startCol`")
    val endB = bucketOf(s"`$endCol` - interval 1 microsecond")
    val nBuckets = endB - startB + lit(1L)
    val guarded = if (maxBucketsPerInterval > 0) {
      when(nBuckets > maxBucketsPerInterval,
        raise_error(concat(lit("IntervalJoin: interval explodes to "),
          nBuckets.cast("string"), lit(s" buckets > " +
            s"maxBucketsPerInterval=$maxBucketsPerInterval; widen " +
            "bucketMicros, split the interval, or pass " +
            "maxBucketsPerInterval=0"))))
        .otherwise(sequence(startB, endB))
    } else sequence(startB, endB)
    val i = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) < col(endCol)) // empty/negative: match nothing
      .withColumn("__graft_bucket", explode(guarded))

    // explicit aliases: both sides often derive from the SAME source
    // (q75 joins events to events), and bare p(k) === i(k) there leans
    // on the analyzer's ambiguous-self-join fixup (and logs a
    // "trivially true equals predicate" warning); qualified names are
    // unambiguous under any analyzer config
    val pa = p.alias("__graft_pt")
    val ia = i.alias("__graft_iv")
    def pc(c: String) = col(s"__graft_pt.`$c`")
    def ic(c: String) = col(s"__graft_iv.`$c`")
    val cond = keys.map(k => pc(k) === ic(k))
      .fold(pc("__graft_bucket") === ic("__graft_bucket"))(_ && _) &&
      pc(pointTs) >= ic(startCol) && pc(pointTs) < ic(endCol)
    keys.foldLeft(
      pa.join(ia, cond, how)
        .drop(ic("__graft_bucket")).drop(pc("__graft_bucket"))
    )((d, k) => d.drop(ic(k)))
  }
}
