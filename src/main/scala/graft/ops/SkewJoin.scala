package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins — the manual complement
  * to AQE's skew-join splitting, for the case AQE cannot fix: a
  * dimension side too large to broadcast joined on a key where one
  * value carries a huge share of the fact rows (the "80% of turns are
  * role=assistant" / "half the events are page_view" shape). A plain
  * hash/sort-merge join sends EVERY row of the hot key to one shuffle
  * partition — one straggler task does most of the work no matter how
  * many executors exist, which is precisely the scaling-efficiency
  * killer the north rule's N→4N criterion measures.
  *
  * Mechanism: the fact side gets a deterministic salt in [0, salts)
  * (xxhash64 over the whole row — any value works, the join is
  * salt-complete); the dimension side is replicated once per salt via
  * a map-side explode. The join key becomes (keys…, salt), so the hot
  * key's rows spread over `salts` shuffle partitions while each fact
  * row still meets every matching dimension row exactly once — the
  * result MULTISET is provably identical to the unsalted inner join
  * (each fact row has one salt; the dimension carries all of them).
  * Cost: the dimension shuffles `salts`× its size — the deliberate
  * trade (replicate the small side, split the big side's hot key).
  *
  * Inner-join semantics only (NULL keys never match, as in SQL).
  * `salts` = 1 degenerates to the plain join.
  */
object SkewJoin {

  /** `big ⋈ small` on `keys`, salt-split `salts` ways. Output columns:
    * keys…, big's non-key columns, small's non-key columns. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(keys.nonEmpty, "at least one join key")
    // salt = row hash over the HASHABLE columns (xxhash64 rejects map
    // columns — Spark maps have no canonical order). Any per-row value
    // splits the hot key; correctness never depends on WHICH salt a
    // row gets, only on the dim carrying all of them, so skipping
    // unhashable columns is safe. A fact whose every column is a map
    // degenerates to salt 0 — still correct, just unsplit.
    val hashable = big.schema.fields
      .filterNot(_.dataType.isInstanceOf[
        org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    val saltSrc = if (hashable.nonEmpty) xxhash64(hashable: _*)
      else lit(0L)
    val bigS = big.withColumn("__graft_salt",
      pmod(saltSrc, lit(salts.toLong)))
    val smallS = small.withColumn("__graft_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, keys :+ "__graft_salt").drop("__graft_salt")
  }

  /** Skew DIAGNOSIS — the measurement that decides `salts` before
    * anyone pays for a salted join: per-key row counts, the top-K
    * hottest keys, and an integer-exact salt recommendation. The
    * recommendation rule (pinned for the oracle): a key is "hot" when
    * `max_n * n_keys >= 2 * n_rows` (the hottest key carries at least
    * 2× the average key's rows); then `rec_salts = ceil(max_n * n_keys
    * / n_rows)` — the split factor that brings the hot partition back
    * to ~average — else 1 (don't salt a uniform key: the dim-side
    * replication is pure cost). All arithmetic is integer (`div`,
    * products before divisions), exact at any scale — a double ratio
    * would mis-round exactly when counts get large enough to matter.
    *
    * Shape: one map-side-partial count per key (histogram-sized
    * output), a TakeOrderedAndProject top-K (distributed partial
    * top-K, never a full sort), and a single-row global fold — the
    * corpus is scanned once. A NULL key is a REAL group here (the
    * hot-NULL flood is the most common skew incident of all); it
    * ranks like any other key.
    *
    * Output: one row per top-K key — (key_rank, key_value as string,
    * n, share_permille) — each carrying the globals (n_rows, n_keys,
    * rec_salts) so a single row is an actionable alert.
    */
  def diagnose(df: DataFrame, key: org.apache.spark.sql.Column,
      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val counts = df.groupBy(key.cast("string").as("key_value"))
      .agg(count(lit(1)).as("n"))
    // the gate/ceil products run in decimal(38,0): max_n * n_keys at
    // 10^10 rows x 10^9 keys is ~10^19 — past Long.MaxValue, where a
    // raw long product wraps negative (non-ANSI) or throws (ANSI) on
    // exactly the most skewed inputs this op exists to flag (review
    // find; `div` accepts decimal operands and stays integral)
    val totals = counts.agg(
      coalesce(sum(col("n")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      coalesce(max(col("n")), lit(0L)).as("max_n"))
      .withColumn("rec_salts",
        when(expr("CAST(max_n AS DECIMAL(38,0)) * n_keys") >=
            expr("CAST(n_rows AS DECIMAL(38,0)) * 2"),
          expr("(CAST(max_n AS DECIMAL(38,0)) * n_keys + n_rows - 1)" +
            " div n_rows"))
          .otherwise(lit(1L)))
      .drop("max_n")
    val top = Ranked.rankedTopK(counts,
      Seq(col("n").desc, col("key_value").asc_nulls_first),
      topK, "key_rank")
    top.crossJoin(totals)
      .withColumn("share_permille",
        expr("n * 1000 div n_rows"))
      .select("key_rank", "key_value", "n", "share_permille",
        "n_rows", "n_keys", "rec_salts")
  }

  /** Join-size FORECAST — exact output cardinality of `left ⋈ right`
    * on `key` from the two key histograms, before paying for the join:
    * per matching key the join emits `n_left · n_right` rows, so the
    * histogram join (histogram-sized, never fact-sized) prices the
    * real one exactly. The top contributors are the second half of the
    * answer: one key carrying 10^10 of the 10^10.2 forecast rows is a
    * fan-out bomb ([[diagnose]]'s output-side sibling — diagnose reads
    * input skew, this reads the product), and the fix differs (salt vs
    * pre-aggregate vs semantic dedup), so the audit names the keys.
    *
    * Arithmetic: per-key counts are longs, but the PRODUCT of two
    * 10^12-row sides overflows a long (10^24) — products and their sum
    * are `decimal(38,0)`, exact to 10^38. NULL keys never match in an
    * inner join (SQL equality) and are excluded exactly as the real
    * join would exclude them.
    */
  def joinSizeForecast(left: DataFrame, right: DataFrame, key: String,
      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val ha = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val hb = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    val j = ha.join(hb, Seq(key))
      .withColumn("pair_rows",
        col("n_left").cast("decimal(38,0)") * col("n_right"))
    val totals = j.agg(
      coalesce(sum(col("pair_rows")), lit(0).cast("decimal(38,0)"))
        .as("total_pair_rows"),
      count(lit(1)).as("n_matched_keys"))
    Ranked.rankedTopK(j,
      Seq(col("pair_rows").desc, col(key).asc_nulls_first),
      topK, "key_rank")
      .crossJoin(totals)
      .select(col("key_rank"), col(key), col("n_left"), col("n_right"),
        col("pair_rows"), col("total_pair_rows"), col("n_matched_keys"))
  }
}
