package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text normalization — the cleaning pass a corpus takes BEFORE any
  * tokenize/dedup/quality stage: strip ASCII control characters
  * (keeping `\t \n \r`, the only controls that are legitimate
  * whitespace), collapse every whitespace run to a single space, trim.
  * The output is the corpus's canonical "flat text" form — the exact
  * view the shared tokenizer ([[Decontaminate.tokens]]) already takes
  * of raw text, so on CONTROL-FREE text normalization never changes a
  * document's token sequence (spec-pinned): dedup keys, contamination
  * grams, and quality scores computed before and after cleaning agree.
  * Stripping an embedded control character DOES edit the token carrying
  * it (`ab` → `ab`) — that is the cleaning, not a violation: the
  * corrupted token was never a real word, and the stripped form is the
  * one dedup should key on.
  *
  * Both engines replay the same two regexes; character classes are
  * explicit code-point lists (`[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]`,
  * `[ \t\r\n]+`) — never `\s`, whose membership differs between regex
  * engines (Java includes `\x0B`, RE2 does not), so the cleaned bytes
  * are engine-exact by construction.
  *
  * Diagnostics ride along: raw/clean character counts and the number of
  * stripped control characters — the audit columns a curation report
  * reads to find the feed that is shipping binary garbage.
  *
  * 100 TB shape: pure map-side, ZERO shuffles, plain codegen'd string
  * expressions. NULL ids are dropped (no document identity); NULL texts
  * pass through as NULL with NULL diagnostics (a transformer must not
  * drop rows it cannot clean — downstream quality gates decide).
  */
object TextClean {

  /** Controls minus `\t\n\r`: the characters that are never legitimate
    * in text and never whitespace.
    */
  private val CtrlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Explicit whitespace-run class — see the `\s` caveat above. */
  private val WsRun = "[ \\t\\r\\n]+"

  /** The scalar normal form (exposed for composition). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, CtrlClass, ""), WsRun, " "))

  /** `(idCol, clean_text, n_chars_raw, n_chars_clean, n_controls)` —
    * one row per input row with a non-null id.
    */
  def normalize(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val stripped = regexp_replace(col(textCol), CtrlClass, "")
    docs.where(col(idCol).isNotNull)
      .select(col(idCol),
        normalizeText(col(textCol)).as("clean_text"),
        length(col(textCol)).as("n_chars_raw"),
        length(normalizeText(col(textCol))).as("n_chars_clean"),
        (length(col(textCol)) - length(stripped)).as("n_controls"))
  }
}
