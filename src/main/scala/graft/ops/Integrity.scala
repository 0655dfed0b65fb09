package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the data-quality gate between pipeline
  * stages: how many fact rows reference a key that does not exist in
  * the dimension (a conv_id with no catalog row, a user with no
  * account, an order with no customer)? Orphans are how a routed sink
  * silently loses enrichment — the join that was supposed to decorate
  * them produces nothing — so the audit belongs BEFORE the enrich step,
  * with exact counts, not a sampled guess.
  *
  * Scale shape (the dedup-before-expensive-step rule again): the fact
  * table is first reduced to per-key counts — ONE map-side-partial hash
  * aggregate at fact volume, emitting |distinct keys| rows — and only
  * that key-level table joins against the dimension's distinct key set.
  * The join never sees fact rows; at 10^12 facts over 10^9 keys that is
  * a 1000× reduction before any join shuffle, and when the distinct dim
  * key set is broadcastable the whole audit is one shuffle total.
  *
  * NULL semantics are SQL's `MATCH SIMPLE`: a NULL foreign key is NOT a
  * violation (it joins to nothing by definition) — it is reported
  * separately as `n_null_rows`, because a null-key flood is its own
  * data-quality signal (q97's budget rule: never let NULL silently pool
  * into a real group).
  */
object Integrity {

  /** One row per audit: (fk_name, n_rows, n_null_rows, n_orphan_rows,
    * n_orphan_keys, min_orphan_key, max_orphan_key) — min/max in the
    * key's own type (NULL when no orphans), the first thing a triager
    * asks ("which ids? a range or scattered?").
    */
  def fkAudit(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fkName: String): DataFrame = {
    val orphan = col("__graft_k").isNotNull && col("__graft_dk").isNull
    fact
      .groupBy(col(factKey).as("__graft_k"))
      .agg(count(lit(1)).as("__graft_n"))
      .join(dim.select(col(dimKey).as("__graft_dk")).distinct(),
        col("__graft_k") === col("__graft_dk"), "left")
      .agg(
        coalesce(sum(col("__graft_n")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("__graft_k").isNull, col("__graft_n"))
          .otherwise(0L)), lit(0L)).as("n_null_rows"),
        coalesce(sum(when(orphan, col("__graft_n")).otherwise(0L)),
          lit(0L)).as("n_orphan_rows"),
        coalesce(sum(when(orphan, 1L).otherwise(0L)), lit(0L))
          .as("n_orphan_keys"),
        min(when(orphan, col("__graft_k"))).as("min_orphan_key"),
        max(when(orphan, col("__graft_k"))).as("max_orphan_key"))
      .select(lit(fkName).as("fk_name"), col("n_rows"),
        col("n_null_rows"), col("n_orphan_rows"), col("n_orphan_keys"),
        col("min_orphan_key"), col("max_orphan_key"))
  }

  /** Functional-dependency audit — does `lhs → rhs` actually hold in
    * the data (each lhs value maps to exactly one rhs)? The FD family
    * is what schema docs CLAIM and joins silently ASSUME: enriching on
    * a key whose FD is broken picks an arbitrary rhs per duplicate —
    * nondeterministic output that no error surfaces. The audit is one
    * map-side-partial aggregate per lhs (|lhs| rows, never a join)
    * folded to a single verdict row.
    *
    * NULL semantics pinned for the oracle: a NULL rhs counts as ONE
    * distinct value (`countDistinct` skips nulls, so the null presence
    * is added back explicitly) — "sometimes X, sometimes unknown" IS a
    * violation signal; and a NULL lhs is a real group like any other.
    */
  def fdAudit(df: DataFrame, lhs: Seq[String], rhs: String,
      fdName: String): DataFrame = {
    require(lhs.nonEmpty, "at least one lhs column")
    val per = df.groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"),
        (countDistinct(col(rhs)) +
          max(when(col(rhs).isNull, 1L).otherwise(0L))).as("__graft_k"))
    val bad = col("__graft_k") > 1
    per.agg(
      coalesce(sum(col("__graft_n")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_lhs"),
      coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L))
        .as("n_violating_lhs"),
      coalesce(sum(when(bad, col("__graft_n")).otherwise(0L)), lit(0L))
        .as("n_rows_in_violations"),
      coalesce(max(col("__graft_k")), lit(0L)).as("max_rhs_per_lhs"))
      .select(lit(fdName).as("fd_name"), col("n_rows"), col("n_lhs"),
        col("n_violating_lhs"), col("n_rows_in_violations"),
        col("max_rhs_per_lhs"))
  }
}
