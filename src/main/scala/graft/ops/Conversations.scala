package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversation-level operators over the transcript table
  * (conv_id, turn_idx, role, text, tool, ts) — the rollups a training-data
  * pipeline runs ABOVE the per-turn scan: per-conversation stats, ordered
  * transcript reconstruction, and whole-conversation exact dedup.
  *
  * 100 TB shape: everything here is ONE shuffle keyed on conv_id — the
  * same key the flagship scan routes and buckets by, so at cluster scale
  * these rollups co-partition with the routed sinks (a bucketed/sorted
  * sink table makes the shuffle disappear entirely). Per-group state is
  * bounded by conversation length (turns per conv), never corpus size;
  * the in-row sort/concat work is array HOFs after the single aggregation.
  * All outputs are exact integer/string arithmetic, so the DuckDB oracle
  * reproduces them bit-exactly.
  */
object Conversations {

  private def turnStruct: Column =
    struct(col("turn_idx"), col("role"), col("text"))

  /** One ordered "role: text" line per turn, '\n'-joined — the canonical
    * serialized transcript (turn order = turn_idx, the north rule's stable
    * ordering). Human-readable but NOT injective (a text containing
    * "\nrole: " serializes like a turn boundary), so the dedup fingerprint
    * uses [[digestSerialized]] instead.
    *
    * Null role/text render as empty (coalesce): a bare `concat` would be
    * NULL for the whole line and concat_ws would silently DROP the turn
    * from the transcript (round-5 review find — the digest path was fixed
    * for the same null-swallowing hazard; the q55 oracle mirrors the
    * coalesce).
    */
  private def serialized(arr: Column): Column =
    concat_ws("\n",
      transform(arr, x =>
        concat(coalesce(x.getField("role"), lit("")), lit(": "),
          coalesce(x.getField("text"), lit("")))))

  /** INJECTIVE transcript serialization for fingerprinting: each turn
    * contributes md5(role) || md5(text) — two FIXED-WIDTH digests, so no
    * field content can fake a turn boundary or shift fields (the naive
    * "role: text\n" join let a text containing a newline + "role: " prefix
    * collide with two separate turns, silently dropping a non-duplicate in
    * dedupExact). Fixed-width fields => distinct turn sequences map to
    * distinct strings (up to md5 collisions), and the whole thing is one
    * md5 over the '-'-free hex concat — bit-reproducible in any engine.
    *
    * NULL fields take a fixed 32-zero filler instead of nulling the whole
    * turn's digest: md5(null) is null and concat_ws skips null elements,
    * so a null-text turn would contribute NOTHING — [(u,"hi"),(a,NULL)]
    * would fingerprint like [(u,"hi")] and dedupExact would silently drop
    * a non-duplicate. The filler is distinct from md5("") and collides
    * with a real digest only at the already-accepted 2^-128 md5 bound.
    */
  private val NullDigest = "0" * 32
  private def digestSerialized(arr: Column): Column =
    concat_ws("",
      transform(arr, x =>
        concat(coalesce(md5(x.getField("role")), lit(NullDigest)),
          coalesce(md5(x.getField("text")), lit(NullDigest)))))

  /** Per-conversation rollup: turn count, distinct-role count, total text
    * chars, wall-clock span in microseconds, and the whole-conversation
    * fingerprint (md5 of the INJECTIVE per-turn-digest serialization —
    * see [[digestSerialized]]).
    */
  def stats(turns: DataFrame): DataFrame =
    turns.groupBy("conv_id")
      .agg(
        count(lit(1)).as("n_turns"),
        size(array_distinct(collect_list(col("role")))).as("n_roles"),
        sum(length(col("text"))).as("n_chars"),
        // cast: the table may carry TIMESTAMP_NTZ; with the session tz
        // pinned to UTC the NTZ->LTZ cast is instant-preserving
        (max(unix_micros(col("ts").cast("timestamp"))) -
          min(unix_micros(col("ts").cast("timestamp")))).as("span_us"),
        array_sort(collect_list(turnStruct)).as("arr"))
      .withColumn("fp", md5(digestSerialized(col("arr"))))
      .drop("arr")
      .withColumn("n_roles", col("n_roles").cast("long"))

  /** Ordered transcript reconstruction: (conv_id, transcript) with turns
    * serialized as "role: text" lines — the bridge from the turn table to
    * the document-level curation family (quality, dedup, decontamination
    * all run on the reconstructed text).
    */
  def transcriptText(turns: DataFrame): DataFrame =
    turns.groupBy("conv_id")
      .agg(array_sort(collect_list(turnStruct)).as("arr"))
      .select(col("conv_id"), serialized(col("arr")).as("transcript"))

  /** (conv_id, fp) only — the dedup key without the stats columns. */
  def fingerprints(turns: DataFrame): DataFrame =
    turns.groupBy("conv_id")
      .agg(array_sort(collect_list(turnStruct)).as("arr"))
      .select(col("conv_id"), md5(digestSerialized(col("arr"))).as("fp"))

  /** Whole-conversation exact dedup groups: fingerprint, group size, and
    * the canonical keep (min conv_id) — the conversation-level analog of
    * [[Dedup.exact]], for corpora where entire sessions are re-ingested.
    * Second shuffle carries only (conv_id, fp) pairs, one row per
    * conversation.
    */
  def dedupExact(turns: DataFrame): DataFrame =
    fingerprints(turns)
      .groupBy("fp")
      .agg(count(lit(1)).as("n_convs"),
        min(col("conv_id")).as("canonical_conv_id"))
}
