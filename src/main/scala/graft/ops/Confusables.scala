package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Confusable-skeleton matching — the typosquat detector the fuzzy join
  * ([[FuzzyJoin]], edit distance) does NOT catch: `paypa1.com` and
  * `g00gle-login.net` are deliberate CHARACTER SUBSTITUTIONS, not typos,
  * and every substituted character keeps the edit distance growing while
  * the visual identity stays perfect. The classic counter (Unicode
  * TR#39's skeleton idea reduced to the ASCII leet alphabet) maps each
  * confusable character to its visual base and compares skeletons
  * EXACTLY — unlimited substitutions collapse to one equi-join.
  *
  * The map is a fixed public leet table (digit/symbol → letter, hyphen
  * deleted): 0→o 1→l 3→e 5→s 7→t 8→b $→s @→a !→i |→l, '-'→removed.
  * Both engines implement `translate` with identical
  * shorter-to-deletes semantics, so the skeleton is bit-reproducible.
  *
  * 100 TB shape: skeletons are map-side codegen; the watchlist is
  * BROADCAST (intel feeds are small — the [[graft.intel.IntelDb]]
  * assumption) so the probe corpus never shuffles for the join.
  */
object Confusables {

  private val FromChars = "013578$@!|-"
  private val ToChars = "olestbsail"

  /** The visual skeleton: lowercase, leet characters folded to their
    * base letter, hyphens removed. NULL in, NULL out.
    */
  def skeleton(c: Column): Column =
    translate(lower(c), FromChars, ToChars)

  /** Probe domains joined to watchlist domains by equal skeleton.
    * Returns (probe column, watch_domain, skeleton) — one row per
    * (probe row, watch entry) pair. `excludeExact` (default true) drops
    * pairs where the probe ALREADY equals the watch entry: those are
    * literal-lookup hits, not disguises. Watch entries with NULL
    * domains never match (null-skeleton join keys drop out).
    */
  def matchWatchlist(probes: DataFrame, probeCol: String,
      watch: DataFrame, watchCol: String = "domain",
      excludeExact: Boolean = true): DataFrame = {
    require(!probes.columns.contains("watch_domain") &&
      !probes.columns.contains("skeleton"),
      "input already has watch_domain/skeleton — rename them")
    val w = broadcast(watch
      .select(col(watchCol).as("watch_domain"),
        skeleton(col(watchCol)).as("skeleton"))
      .where(col("skeleton").isNotNull)
      .distinct())
    val joined = probes
      .withColumn("skeleton", skeleton(col(probeCol)))
      .join(w, Seq("skeleton"), "inner")
    val out =
      if (excludeExact) joined.where(lower(col(probeCol)) =!=
        lower(col("watch_domain")))
      else joined
    out.select(probes.columns.map(col) :+ col("watch_domain") :+
      col("skeleton"): _*)
  }
}
