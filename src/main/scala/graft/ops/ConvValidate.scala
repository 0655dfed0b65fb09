package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation structural validation — the well-formedness audit a
  * transcript corpus runs BEFORE training-data assembly: duplicate turn
  * indices, consecutive same-role turns (broken alternation), and empty
  * turns all corrupt the serialized context a model trains on, and each
  * is invisible to per-turn scans. One row per conversation with exact
  * violation counts plus a `wellformed` verdict.
  *
  * Canonical order: (turn_idx, role NULLS FIRST). turn_idx alone is the
  * contract order (the north rule's stable ordering), but a duplicated
  * index — itself a violation this op counts — would make "adjacent"
  * ambiguous, so the role tie-break pins a total order and both engines
  * see the same adjacency. A same-role pair created by sorting a
  * duplicated index is still a defect worth flagging: the serialized
  * transcript has no way to order those turns either.
  *
  * Null semantics: a NULL role is a role value like any other —
  * two adjacent NULL-role turns count as a repeat (null-safe equality),
  * and an all-NULL conversation is still structurally auditable. An
  * empty turn is NULL text or text with zero whitespace tokens (same
  * tokenizer as [[TextStats.tokenCount]] — "\n" is empty, round-5
  * boundary rule).
  *
  * 100 TB shape: ONE hash shuffle on conv_id (window + groupBy share the
  * partitioning, so Spark plans a single Exchange); per-group state is
  * one counter row; everything else is map-side codegen. Co-partitions
  * with the routed sinks (the Conversations rule).
  */
object ConvValidate {

  /** Per-conversation audit: n_turns, n_dup_idx (turns minus distinct
    * indices), n_role_repeats (adjacent same-role pairs in canonical
    * order), n_empty (NULL or zero-token text), first_role / last_role
    * (canonical order, NULL-safe), wellformed (all three counts zero).
    */
  def audit(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id")
      .orderBy(col("turn_idx"), col("role").asc_nulls_first)
    val prevRole = lag(col("role"), 1).over(w)
    // lag(role) is NULL both on the first row and after a NULL-role
    // turn; the marker disambiguates (NULL only on the first row)
    val prevMark = lag(lit(1), 1).over(w)
    val rn = row_number().over(w)
    val flagged = turns.select(
      col("conv_id"), col("turn_idx"), col("role"), col("text"),
      (prevMark.isNotNull && (col("role") <=> prevRole))
        .cast("int").as("is_repeat"),
      (col("text").isNull || TextStats.tokenCount(col("text")) === 0)
        .cast("int").as("is_empty"),
      rn.as("rn"))
    val n = count(lit(1))
    flagged.groupBy("conv_id").agg(
      n.as("n_turns"),
      (n - countDistinct(col("turn_idx"))).as("n_dup_idx"),
      sum(col("is_repeat")).as("n_role_repeats"),
      sum(col("is_empty")).as("n_empty"),
      max(when(col("rn") === 1, coalesce(col("role"), lit(""))))
        .as("first_role"),
      max_by(coalesce(col("role"), lit("")), col("rn")).as("last_role"))
      .withColumn("wellformed",
        col("n_dup_idx") === 0 && col("n_role_repeats") === 0 &&
          col("n_empty") === 0)
  }
}
