package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 fuzzy dictionary join — "which observed values are a
  * typo of a watchlist entry": typosquat domains, fat-fingered hashes,
  * look-alike emails, near-miss intel indicators (the fuzzy companion to
  * the exact/glob lookups in [[graft.intel.IntelDb]]; the reference's
  * literal matcher is exact-only, so this is a training-data-pipeline
  * extension, not a port).
  *
  * Algorithm: symmetric deletion neighborhoods (the FastSS / SymSpell
  * family, public literature). For distance 1 the candidate test is
  * exact-complete in one direction: lev(s, t) <= 1 (substitution,
  * insertion, deletion or equality) implies D1(s) ∩ D1(t) != ∅ where
  * D1(x) = {x} ∪ {x minus one char}, because deleting the edited
  * position from both sides yields the same string. The converse is NOT
  * true (sharing a variant only bounds lev <= 2 — "ab"/"ba" share "a"),
  * so every candidate passes an exact `levenshtein` residual. Candidates
  * therefore come from ONE hash equi-join on the variant string; no
  * theta join, no cartesian, no per-pair scan of the dictionary.
  *
  * 100 TB shape: the watchlist is the curated small side — its variant
  * table (|watch| × (len+1) rows) is BROADCAST, so the probe corpus
  * never shuffles for the join. Probe-side work is one map-side explode
  * of len+1 variants per distinct value plus the hash probes; the only
  * shuffles are the probe-value dedup (linear, value-keyed) and the
  * output-pair dedup (output-sized — two values sharing several variants
  * must not double-report). Output is the matched PAIR SET over distinct
  * values, not per-row matches: join it back to the corpus on the value
  * column to annotate rows (the dictionary-dedup shape every
  * dedup/lookup op here uses).
  *
  * Bounds: strings longer than `maxLen` participate EXACT-only (their
  * deletion neighborhoods are skipped on both sides — a megabyte blob
  * would otherwise broadcast a megabyte² of variant bytes). That trades
  * recall for a hard size bound, never coverage: such values still match
  * themselves, and a dist-1 pair where either side exceeds maxLen is
  * missed by design (documented, like the dedup family's cluster caps).
  * NULL values on either side never match (SQL equi-join NULL rule).
  */
object FuzzyJoin {

  /** Longest string whose deletion neighborhood is generated; above it a
    * value is matched exact-only. 64 covers domains, emails, hashes and
    * crypto addresses — every indicator family the extractors emit.
    */
  val DefaultMaxLen = 64

  /** D1(c): the value plus every one-char deletion, deduped. Variant
    * generation is pure Column algebra (codegen'd, no UDF): position i's
    * deletion is substr(1, i-1) || substr(i+1). Empty strings and
    * over-long strings contribute only themselves (`sequence(1, 0)`
    * would count DOWN — Spark's sequence has no empty-range form — so
    * the length-0 case must short-circuit).
    */
  private[ops] def deletionVariants(c: Column, maxLen: Int): Column =
    when(length(c) === 0 || length(c) > maxLen, array(c))
      .otherwise(array_distinct(concat(
        array(c),
        transform(sequence(lit(1), length(c)), i =>
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))))

  /** Distinct (probe, watch, dist) pairs with levenshtein(probe, watch)
    * <= 1, where `probe` ranges over the distinct non-null values of
    * `probe(probeCol)` and `watch` over the distinct non-null values of
    * `watch(watchCol)`. `dist` is 0 (exact) or 1 (one edit).
    */
  def editDistance1Join(probe: DataFrame, probeCol: String,
      watch: DataFrame, watchCol: String,
      maxLen: Int = DefaultMaxLen): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    val pv = probe.select(col(probeCol).cast("string").as("probe"))
      .where(col("probe").isNotNull).distinct()
    val wv = watch.select(col(watchCol).cast("string").as("watch"))
      .where(col("watch").isNotNull).distinct()
    val pvar = pv.select(col("probe"),
      explode(deletionVariants(col("probe"), maxLen)).as("v"))
    val wvar = wv.select(col("watch"),
      explode(deletionVariants(col("watch"), maxLen)).as("v"))
    pvar.join(broadcast(wvar), "v")
      .where(levenshtein(col("probe"), col("watch")) <= 1)
      .select("probe", "watch").distinct()
      .withColumn("dist", levenshtein(col("probe"), col("watch")))
  }
}
