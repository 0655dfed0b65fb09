package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID
  * (marker-word heuristic), quality scoring, token counting, document
  * fingerprinting. Deterministic integer/string arithmetic only, so the
  * DuckDB oracle reproduces every value bit-exactly.
  */
object TextStats {

  /** Occurrences of `needle` in `hay` (non-overlapping, by replace).
    * Spark `length` counts CODE POINTS, so the divisor must too — a
    * UTF-16-unit divisor (`needle.length`) halves or zeroes counts for
    * needles containing supplementary characters; an empty needle would
    * be 0/0 -> NaN -> ANSI cast crash (round-5 fix).
    */
  def occurrences(hay: Column, needle: String): Column = {
    require(needle.nonEmpty, "occurrences: empty needle")
    ((length(hay) - length(regexp_replace(hay,
      java.util.regex.Pattern.quote(needle), ""))) /
      needle.codePointCount(0, needle.length)).cast("int")
  }

  /** Marker words per language — tiny n-gram-ish heuristic. Scores are
    * marker hit counts over the lowercased, space-padded text; the argmax
    * (ties -> lexicographically first language) is the detected language.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die ", " nicht ", " das "),
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "es" -> Seq(" el ", " los ", " que ", " de ", " una "),
    "fr" -> Seq(" le ", " les ", " des ", " une ", " est ")
  )

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map { case (lang, words) =>
      lang -> words.map(w => occurrences(padded, w)).reduce(_ + _)
    }
  }

  /** Argmax over already-projected per-language score COLUMNS; ties break
    * to the first language in `markers` order.
    *
    * NULL text => NULL (consistent with every other TextStats feature):
    * null text makes every marker score null, every CASE condition null,
    * and the cascade would otherwise fall through its final otherwise and
    * silently classify every null-text row as the LAST language in
    * `markers` order. The first score column is the null sentinel (all
    * scores are null exactly when the text is). The DuckDB oracle mirrors
    * the same leading NULL arm.
    */
  def langIdFromScores(scoreCols: Seq[(String, Column)]): Column = {
    val allZero = scoreCols.map(_._2 === 0).reduce(_ && _)
    // lang l wins iff its score >= every later language's score (earliest
    // max wins, same semantics as an incumbent-keeps-ties fold)
    val cases = scoreCols.zipWithIndex.map { case ((lang, s), i) =>
      val laterGeq = scoreCols.drop(i + 1).map(o => s >= o._2)
      (lang, if (laterGeq.isEmpty) lit(true) else laterGeq.reduce(_ && _))
    }
    val picked = cases.init.foldRight(lit(cases.last._1)) {
      case ((lang, cond), rest) => when(cond, lit(lang)).otherwise(rest)
    }
    when(scoreCols.head._2.isNull, lit(null).cast("string"))
      .when(allZero, lit("und"))
      .otherwise(picked)
  }

  /** Two-step language ID: PROJECT the marker scores first, then argmax
    * over the score columns. Inlining the scores into one Column (a fold)
    * duplicates each score subtree exponentially — it blew the 64KB codegen
    * method limit and disabled whole-stage codegen for the stage.
    */
  def withLangId(df: DataFrame, textCol: String = "text",
      out: String = "lang_detected"): DataFrame = {
    val scored = langScores(col(textCol)).foldLeft(df) {
      case (acc, (lang, score)) => acc.withColumn(s"_score_$lang", score)
    }
    val scoreCols = markers.map { case (lang, _) =>
      lang -> col(s"_score_$lang")
    }
    scored.withColumn(out, langIdFromScores(scoreCols))
      .drop(markers.map(m => s"_score_${m._1}"): _*)
  }

  /** Single-Column language ID (small texts / tests). Prefer withLangId in
    * pipelines — see its note on expression duplication.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    langIdFromScores(scores.map { case (l, s) => l -> s })
  }

  /** Whitespace token count. Boundary empties are filtered, not trimmed:
    * `trim` strips only 0x20, so "foo\n" used to count 2 tokens (the
    * phantom "" after split) and "\n" counted 2 instead of 0 — trailing
    * newlines are ubiquitous, so token counts were systematically
    * inflated and mean_token_len deflated, flipping qualityFilter
    * verdicts near the thresholds (round-5 fix; null text stays null).
    */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count: word-piece segments of <= 4 chars, i.e.
    * ceil(len/4) summed over whitespace tokens — a deterministic proxy for
    * tokenizer cost (real BPE needs a vocab). Punctuation contributes only
    * through the length of the token it sits in; there is no separate
    * punctuation-run term (the oracle reproduces exactly this formula).
    */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(aggregate(split(trim(text), "\\s+"), lit(0L),
        (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long")))

  /** BPE-ish REGEX token count: the pre-tokenization split every byte-level
    * BPE applies before merges (GPT-2 style, simplified to RE2-compatible
    * syntax so the DuckDB oracle can reproduce it): a token is a maximal
    * run of letters, a run of digits, or a run of other non-space symbols.
    * This is the actual "how many pieces does the tokenizer see" number;
    * subwordCount above remains the per-word length proxy.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern)).cast("long")

  /** Quality features + a composite score in [0,1]:
    * fraction of alnum chars, stopword presence, length band. Single
    * deterministic arithmetic expression (cross-engine exact).
    */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nSpaces = length(t) - length(regexp_replace(t, " ", ""))
    val nPunct = length(regexp_replace(t, "[^.,;:!?]", ""))
    val tokens = tokenCount(t)
    val stopHits = stopwordHits(t)
    docs
      .withColumn("n_chars_m", nChars)
      .withColumn("n_tokens", tokens)
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("alnum_ratio", alnumRatioExpr(t))
      .withColumn("space_ratio",
        nSpaces.cast("double") / greatest(nChars, lit(1)).cast("double"))
      .withColumn("punct_ratio",
        nPunct.cast("double") / greatest(nChars, lit(1)).cast("double"))
      .withColumn("stopword_hits", stopHits)
      .withColumn("mean_token_len", meanTokenLenExpr(t, tokens))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the canonical key for fuzzy-exact dedup across formatting variants.
    * Collapse FIRST, then trim: `trim` strips only 0x20 spaces, so
    * trim-then-collapse left "foo\n" fingerprinting as "foo " — a
    * distinct md5 from the "foo" it is a formatting variant of, silently
    * keeping duplicates (round-5 fix; after the collapse all whitespace
    * IS spaces, so the trim is total).
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Gopher-style quality FILTER (Rae et al. 2021, appendix A — the public
    * heuristic rule family): the keep/drop decision a training-data
    * pipeline actually applies, built on qualityFeatures. `fail_reason`
    * names the FIRST failing rule (rule order below) for drop-set
    * diagnostics; `keep` is true iff no rule fails. All arithmetic is the
    * deterministic cross-engine-exact feature set, so thresholds compare
    * identically in any engine.
    *
    * Rules (in order): token count in [minTokens, maxTokens]; mean token
    * length in [minMeanTokenLen, maxMeanTokenLen]; alphanumeric character
    * ratio >= minAlnumRatio; >= minStopwordHits stopword occurrences.
    */
  def qualityFilter(docs: DataFrame, textCol: String = "text",
      minTokens: Long = 25, maxTokens: Long = 100000,
      minMeanTokenLen: Double = 3.0, maxMeanTokenLen: Double = 10.0,
      minAlnumRatio: Double = 0.6, minStopwordHits: Long = 1): DataFrame =
    qualityFeatures(docs, textCol)
      .withColumn("fail_reason",
        failReasonExpr(col("n_tokens"), col("mean_token_len"),
          col("alnum_ratio"), col("stopword_hits"),
          minTokens, maxTokens, minMeanTokenLen, maxMeanTokenLen,
          minAlnumRatio, minStopwordHits))
      .withColumn("keep", col("fail_reason").isNull)

  /** The first-failing-rule expression over already-computed feature
    * columns — THE single source of the rule order, shared by
    * [[qualityFilter]] and Curation.curate's single-tokenization pass (the
    * two must never drift: curate's oracle mirrors this exact cascade).
    */
  def failReasonExpr(nTokens: Column, meanTokenLen: Column,
      alnumRatio: Column, stopwordHits: Column,
      minTokens: Long, maxTokens: Long,
      minMeanTokenLen: Double, maxMeanTokenLen: Double,
      minAlnumRatio: Double, minStopwordHits: Long): Column =
    when(nTokens < minTokens, "too_few_tokens")
      .when(nTokens > maxTokens, "too_many_tokens")
      .when(meanTokenLen < minMeanTokenLen ||
        meanTokenLen > maxMeanTokenLen, "mean_token_len")
      .when(alnumRatio < minAlnumRatio, "low_alnum_ratio")
      .when(stopwordHits < minStopwordHits, "no_stopwords")

  /** The stopword-hit count shared by [[qualityFeatures]] and curate. */
  def stopwordHits(text: Column): Column =
    Seq(" the ", " and ", " a ", " of ")
      .map(w => occurrences(concat(lit(" "), lower(text), lit(" ")), w))
      .reduce(_ + _)

  // --- shared quality-feature expressions (single source for
  // qualityFeatures AND Curation.curate's single-tokenization pass — the
  // formulas must never drift between the two, or curate's verdicts
  // silently diverge from qualityFilter's and only the oracle notices)

  /** Token count from an already-staged [[Decontaminate.tokens]] array —
    * value-identical to [[tokenCount]] over the same text (the staged
    * array is empty-token-free since the round-5 tokenizer fix, so the
    * size IS the count; lowercasing never changes token boundaries).
    */
  def nTokensOfStaged(toks: Column): Column = size(toks)

  /** chars / tokens with the zero-token guard. */
  def meanTokenLenExpr(text: Column, nTokens: Column): Column =
    length(text).cast("double") /
      greatest(nTokens, lit(1)).cast("double")

  /** Alphanumeric character ratio with the empty-text guard. */
  def alnumRatioExpr(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z0-9]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Gopher repetition signals (Rae et al. 2021, appendix A — the
    * repetition-rule half of the published family, complementing
    * [[qualityFilter]]'s content rules): per-document duplicate-line
    * fractions plus the bullet-start / ellipsis-end formatting fractions.
    *
    * Computed entirely with array higher-order functions over the in-row
    * line array — NO shuffle; at 100 TB these ride the same single map
    * pass as the rest of the per-doc feature family. The duplicate scan
    * sorts the line array once and counts adjacent repeats in a single
    * linear pass, so cost is O(lines log lines) per document, bounded by
    * document size, not corpus size. All arithmetic is exact-integer
    * counts divided once at the end, so the DuckDB oracle reproduces
    * every double bit-exactly.
    *
    * Columns added: `n_lines`, `dup_line_frac` (fraction of lines that are
    * repeats beyond their first occurrence), `dup_line_char_frac` (fraction
    * of line characters inside those repeats), `bullet_line_frac`,
    * `ellipsis_line_frac`.
    */
  def repetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // split ONCE into a staged column — the five stats below reference the
    // line array eight times, and each reference would otherwise re-split
    // the full text (same single-pass discipline as topNgramCharFrac)
    val lines = col("__graft_lines")
    val nLines = size(lines)
    val nDistinct = size(array_distinct(lines))
    // chars in occurrences beyond each line's first = sum over each line
    // value with k occurrences of (k - 1) * length. Equal lines are
    // adjacent after a sort, so one linear pass with a (prev, sum)
    // accumulator counts exactly the occurrences beyond the first.
    val dupChars = aggregate(
      array_sort(lines),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("dup")),
      (acc, x) => struct(
        x.as("prev"),
        (acc.getField("dup") +
          when(acc.getField("prev").isNotNull &&
            x === acc.getField("prev"), length(x).cast("long"))
            .otherwise(lit(0L))).as("dup")),
      acc => acc.getField("dup"))
    val totChars = aggregate(lines, lit(0L),
      (acc, l) => acc + length(l).cast("long"))
    val bulletLines =
      size(filter(lines, l => l.rlike("^\\s*([-*•]|\\d+[.)])\\s")))
    val ellipsisLines =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
    def frac(num: Column, den: Column): Column =
      num.cast("double") / greatest(den, lit(1)).cast("double")
    docs
      .withColumn("__graft_lines", split(col(textCol), "\n"))
      .withColumn("n_lines", nLines)
      .withColumn("dup_line_frac", frac(nLines - nDistinct, nLines))
      .withColumn("dup_line_char_frac", frac(dupChars, totChars))
      .withColumn("bullet_line_frac", frac(bulletLines, nLines))
      .withColumn("ellipsis_line_frac", frac(ellipsisLines, nLines))
      .drop("__graft_lines")
  }

  /** Most frequent word n-gram per document and the fraction of the
    * document's characters its occurrences cover — Gopher's "top n-gram
    * character fraction" rule (drop when one phrase dominates the text).
    *
    * Unlike [[repetitionSignals]] this one counts gram MULTIPLICITY, so it
    * explodes grams and aggregates per (doc, gram): one shuffle keyed by
    * the doc id with map-side partial aggregation, then a per-doc top-1.
    * The tie-break (max count, then lexicographically smallest gram) is
    * total, so the result is deterministic and oracle-exact.
    *
    * Output: `idCol`, `top_gram`, `top_gram_n`, `top_gram_char_frac`
    * (occurrences * gram length / document length). Documents with fewer
    * than `n` tokens produce no grams and are absent from the output.
    */
  def topNgramCharFrac(docs: DataFrame, n: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Tokenize ONCE into a materialized column. Higher-order-function
    // lambdas re-evaluate every non-lambda subexpression per element (no
    // CSE, no codegen), so putting the split() inside the slice lambda
    // re-splits the whole document once per token — O(tokens^2) in the
    // document length. An attribute reference is an O(1) row-slot read.
    val toks = col("__graft_toks")
    // Gram construction as a zip_with CHAIN over n shifted views of the
    // token array (n-1 linear passes, lambdas touch only lambda vars) —
    // no per-gram slice mini-arrays, no filter pass. All n shifted slices
    // have length max(T-n+1, 0), so short docs yield zero grams.
    val gramLen = greatest(size(toks) - lit(n - 1), lit(0))
    val grams = (0 until n)
      .map(j => slice(toks, lit(j + 1), gramLen))
      .reduce((acc, s) => zip_with(acc, s, (a, b) => concat_ws(" ", a, b)))
    val win = Window.partitionBy(idCol)
      .orderBy(col("top_gram_n").desc, col("top_gram"))
    docs
      .select(col(idCol), length(col(textCol)).as("doc_len"),
        // Decontaminate.tokens IS the shared tokenizer (same expression;
        // single-sourced so the cross-op normalization cannot drift)
        Decontaminate.tokens(col(textCol)).as("__graft_toks"))
      .select(col(idCol), col("doc_len"), explode(grams).as("top_gram"))
      .groupBy(idCol, "doc_len", "top_gram")
      .agg(count(lit(1)).as("top_gram_n"))
      .withColumn("rn", row_number().over(win))
      .where(col("rn") === 1)
      .select(col(idCol), col("top_gram"), col("top_gram_n"),
        ((col("top_gram_n") * length(col("top_gram"))).cast("double") /
          greatest(col("doc_len"), lit(1)).cast("double"))
          .as("top_gram_char_frac"))
  }
}
