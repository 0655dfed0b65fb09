package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Routed-output reconciliation — the audit the north rule's "routed-row
  * equality" and "resumable from checkpoint" demands at 10^12 rows: did
  * two runs (a resumed job vs a clean one, a migration vs the reference,
  * yesterday's backfill vs today's) write the SAME row multisets into
  * each sink partition? Sorting 10^12 rows to compare them is a
  * non-starter; instead each side folds to one (count, content-sum) pair
  * per group, where content-sum is the SUM of per-row 60-bit digests —
  * commutative, so partition order, task order, and file layout are all
  * irrelevant, and the whole check is two map-side-partial aggregates
  * plus a group-cardinality join.
  *
  * Digest: per row, md5 over the INJECTIVE serialization of the value
  * columns — each column contributes its own fixed-width md5 (NULL takes
  * a 32-zero filler distinct from md5("")), the
  * [[Conversations]] fingerprint rule, so no value can fake a column
  * boundary — then the first 15 hex chars as a bigint, summed as
  * DECIMAL(38,0) (exact: no wrap even at 10^19 rows per group, unlike a
  * long sum, which overflows — and under ANSI mode would throw — at
  * ~10^4 rows). Two different multisets colliding on BOTH count and sum
  * requires digest collisions at the 2^-60 scale — the standard
  * checksum-reconciliation bound; equal multisets NEVER differ.
  *
  * Output: one row per group seen on either side, with a verdict:
  * `equal`, `count_mismatch`, `content_mismatch` (same count, different
  * rows), `only_left`, `only_right`. NULL group keys reconcile like
  * values (null-safe join), not like SQL join keys — a sink partition
  * named NULL must still compare.
  */
object Reconcile {

  private val NullDigest = "0" * 32

  private def rowDigest(valueCols: Seq[String]): Column = {
    val ser = concat(valueCols.map(c =>
      coalesce(md5(col(c).cast("string")), lit(NullDigest))): _*)
    conv(substring(md5(ser), 1, 15), 16, 10).cast("decimal(38,0)")
  }

  private def summarize(df: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String], side: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(s"n_$side"),
        sum(rowDigest(valueCols)).as(s"sum_$side"))

  /** Per-group reconciliation verdicts between two datasets.
    *
    * @param groupCols the sink/partition identity (e.g. sink, bucket,
    *                  indicator_type) — the granularity of the verdict
    * @param valueCols the row content that must match as a multiset
    */
  def diff(left: DataFrame, right: DataFrame, groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(valueCols.nonEmpty, "at least one value column")
    // the verdict row attaches these; a same-named group column would
    // alias-collide in the output (the Anomaly clash rule), and the
    // __graft_r_ rename seam must not be occupied by caller columns
    val reserved = Seq("n_left", "n_right", "sum_left", "sum_right",
      "status")
    val clash = reserved.filter(groupCols.contains) ++
      groupCols.filter(_.startsWith("__graft_r_"))
    require(clash.isEmpty,
      s"group column(s) ${clash.mkString(", ")} collide with the " +
        "verdict columns / rename seam — rename them (diff attaches " +
        "n_left/n_right/status)")
    // both summaries may share lineage (left/right derived from one
    // source DF — the resume-vs-clean audit does exactly that), so the
    // join must not lean on the analyzer's ambiguous-self-join fixup:
    // the right side's columns are RENAMED before the join, making every
    // reference structurally unambiguous
    val l = summarize(left, groupCols, valueCols, "left")
    val r0 = summarize(right, groupCols, valueCols, "right")
    val r = groupCols.foldLeft(r0)((df, c) =>
      df.withColumnRenamed(c, s"__graft_r_$c"))
    val cond = groupCols.map(c =>
      col(c) <=> col(s"__graft_r_$c")).reduce(_ && _)
    val keyOut = groupCols.map(c =>
      coalesce(col(c), col(s"__graft_r_$c")).as(c))
    val status = when(col("n_left").isNull, lit("only_right"))
      .when(col("n_right").isNull, lit("only_left"))
      .when(col("n_left") =!= col("n_right"), lit("count_mismatch"))
      .when(col("sum_left") =!= col("sum_right"),
        lit("content_mismatch"))
      .otherwise(lit("equal"))
    l.join(r, cond, "full_outer")
      .select(keyOut ++ Seq(
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        status.as("status")): _*)
  }
}
