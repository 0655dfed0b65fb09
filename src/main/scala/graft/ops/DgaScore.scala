package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DGA-suspect scoring for observed domains — the enrichment a hunt team
  * bolts onto the extractor output: algorithmically-generated domains
  * (malware C2 rendezvous) look different from human-registered ones in
  * their FIRST LABEL — long, digit-ridden, vowel-starved, with long
  * consonant runs. This is the classic heuristic feature family
  * (Antonakakis et al.'s Pleiades lineage) reduced to engine-exact
  * arithmetic: every feature is an integer count and every rule is an
  * integer inequality — no entropy logarithm (ln is not correctly
  * rounded, so cross-engine bit-parity would be luck), no float ratios.
  * A hit on ≥ `suspectRules` of the four rules flags the domain.
  *
  * Rules (label = the first dot-separated label, lowercased):
  *   R1 length ≥ 12            (human SLDs are short)
  *   R2 5×digits ≥ length      (≥ 20% digits)
  *   R3 4×vowels ≤ length      (≤ 25% vowels — pronounceability)
  *   R4 longest [^aeiou0-9] run ≥ 5 (consonant smear)
  *
  * Shape: pure map-side column arithmetic — zero shuffles, codegen'd
  * string functions, composes with the extractor/match stream at any
  * scale. Deliberately PSL-free: scoring the first label keeps the op a
  * closed-form expression; feeding it e2LD-normalized domains (the
  * extractor already emits those) is the caller's composition.
  */
object DgaScore {

  private def countOf(c: Column, cls: String): Column =
    length(c) - length(regexp_replace(c, cls, ""))

  /** Input rows with `label`, `label_len`, `n_digits`, `n_vowels`,
    * `max_run`, `dga_rules` (0–4), `dga_suspect` attached. NULL domains
    * yield NULL features and never flag.
    */
  def score(df: DataFrame, domainCol: String,
      suspectRules: Int = 2): DataFrame = {
    require(suspectRules >= 1 && suspectRules <= 4,
      "suspectRules must be in [1, 4]")
    val out = Seq("label", "label_len", "n_digits", "n_vowels",
      "max_run", "dga_rules", "dga_suspect")
    val clash = out.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename " +
        "them (score attaches the feature columns)")
    val label = lower(substring_index(col(domainCol), ".", 1))
    val len = length(col("label"))
    // longest run of non-vowel non-digit chars: split on the
    // complement class, take the longest fragment (empty fragments from
    // adjacent separators contribute 0)
    val run = array_max(transform(
      split(col("label"), "[aeiou0-9]"), x => length(x)))
    val rules =
      when(col("label_len") >= 12, 1).otherwise(0) +
        when(col("n_digits") * 5 >= col("label_len"), 1).otherwise(0) +
        when(col("n_vowels") * 4 <= col("label_len"), 1).otherwise(0) +
        when(col("max_run") >= 5, 1).otherwise(0)
    df.withColumn("label", label)
      .withColumn("label_len", len)
      .withColumn("n_digits", countOf(col("label"), "[0-9]"))
      .withColumn("n_vowels", countOf(col("label"), "[aeiou]"))
      .withColumn("max_run", run)
      .withColumn("dga_rules", rules)
      .withColumn("dga_suspect", col("dga_rules") >= lit(suspectRules))
  }
}
