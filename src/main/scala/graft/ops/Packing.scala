package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget packing — the two sequence-assembly primitives between a
  * curated corpus and a training run: pack many short sequences into
  * fixed-budget bins (sequence packing — pad waste is the single biggest
  * throughput lever in LLM pretraining), and trim each conversation to
  * the suffix that fits a context window (the "keep the most recent
  * turns" rule of chat fine-tuning).
  *
  * Both are exact integer arithmetic over deterministic orders, so the
  * DuckDB oracle reproduces them bit-for-bit: packing is a first-fit
  * sequential scan (a recursive CTE on the oracle side), truncation a
  * reverse running sum (a plain window).
  *
  * 100 TB shape: packing shards the corpus by a portable 60-bit hash
  * ([[Sampling.hashPoint]]) and scans each shard independently — ONE
  * hash shuffle, per-task memory O(1) (the scan streams Spark's
  * spill-friendly sorted iterator; nothing is buffered per group).
  * Shard count scales with the corpus (shards are independent bins
  * namespaces), and adding a shard never moves another shard's
  * assignment. Truncation is ONE window shuffle on conv_id — the routed
  * sinks' key (the Conversations rule).
  */
object Packing {

  /** First-fit sequential packing of (id, token-count) sequences into
    * bins of `budget` tokens within `numShards` hash shards.
    *
    * Scan rule (per shard, ids in STRING order — the hash domain): a
    * sequence goes into the current bin unless the bin is non-empty and
    * would overflow, in which case it opens the next bin. A sequence
    * larger than the budget alone therefore occupies its own bin
    * (overfull — flagged by `n_tokens > budget`, never dropped: packing
    * must not lose corpus).
    *
    * Output: one row per input sequence — id (as string, the hash
    * domain), n_tokens, shard, bin (0-based per shard), pos (0-based
    * within bin). NULL ids are dropped (no hash point — the [[Sampling]]
    * null verdict); NULL token counts pack as 0.
    */
  def packSequences(seqs: DataFrame, budget: Long, numShards: Int,
      idCol: String = "doc_id", tokensCol: String = "n_tokens",
      salt: String = "pack-v1"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    val s = seqs.sparkSession
    import s.implicits._
    seqs.select(
      col(idCol).cast("string").as("id"),
      coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
      .where(col("id").isNotNull)
      .withColumn("shard",
        pmod(Sampling.hashPoint(col("id"), salt), lit(numShards.toLong))
          .cast("int"))
      .select($"shard", $"id", $"n_tokens").as[(Int, String, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      // deterministic regardless of which task a shard lands in: the
      // sort makes each shard contiguous, the scan resets on shard
      // change, and shards never split across tasks (hash partitioning)
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var bin = 0; var fill = 0L; var pos = 0
        it.map { case (shard, id, t) =>
          if (shard != curShard) {
            curShard = shard; bin = 0; fill = 0L; pos = 0
          } else if (fill > 0L && fill + t > budget) {
            bin += 1; fill = 0L; pos = 0
          }
          fill += t
          val row = (id, t, shard, bin, pos)
          pos += 1
          row
        }
      }.toDF("id", "n_tokens", "shard", "bin", "pos")
  }

  /** Keep each conversation's newest turns that fit `budget` whitespace
    * tokens: the suffix (by turn_idx) whose running token sum from the
    * end stays within budget. STRICT semantics: if even the final turn
    * exceeds the budget the conversation yields zero rows — trimming
    * must never emit an over-budget context (callers wanting a
    * keep-at-least-one rule filter `cum_from_end` themselves).
    *
    * Attaches n_tokens (NULL text counts 0 — an empty turn costs
    * nothing) and cum_from_end (running sum from the newest turn).
    * Ties on turn_idx break by (role, text) so the running sum is
    * deterministic even on corrupt conversations ([[ConvValidate]]
    * flags those).
    */
  def truncateTail(turns: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val out = Seq("n_tokens", "cum_from_end")
    val clash = out.filter(turns.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename " +
        "them (truncateTail attaches the budget columns)")
    val w = Window.partitionBy("conv_id")
      .orderBy(col("turn_idx").desc, col("role").desc_nulls_last,
        col("text").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("n_tokens",
        coalesce(TextStats.tokenCount(col("text")), lit(0)).cast("long"))
      .withColumn("cum_from_end", sum(col("n_tokens")).over(w))
      .where(col("cum_from_end") <= budget)
  }
}
