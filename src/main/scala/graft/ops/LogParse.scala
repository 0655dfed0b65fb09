package graft.ops

import graft.functions.GrokParse
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grok-style structured-log parsing over a DataFrame — the parse stage
  * of the parse → enrich → route → aggregate pipeline, for the general
  * log-line case the IoC scanner does not cover (the scanner finds
  * indicators ANYWHERE in free text; this extracts a FIXED line layout
  * into typed columns).
  *
  * One [[graft.functions.GrokParse]] match per row produces every field;
  * the per-field projections read the same array (subexpression
  * elimination keeps it one evaluation — pinned by GrokParseSpec).
  * Non-matching lines keep NULL in every field and `false` in
  * `_grok_matched`, so a dead-letter route is
  * `.where(!col("_grok_matched"))` — parse failures are data, never
  * exceptions (a 10^12-line ingest WILL contain garbage lines).
  *
  * 100 TB shape: entirely map-side (zero shuffles, survives inside
  * whole-stage codegen next to the scan), so it composes with pushdown:
  * a filter on a parsed field stays above the parquet scan but below
  * any shuffle.
  */
object LogParse {

  /** The parsed-fields array column for `grok` (NULL = no match). */
  def grokCol(text: Column, grok: String): Column =
    ExpressionUtils.column(
      GrokParse(ExpressionUtils.expression(text), grok))

  /** `df` plus one string column per grok field and `_grok_matched`.
    * The parsed array is staged ONCE under a reserved name and every
    * field reads from the staged column — a field named like the text
    * column (or any input column) replaces that column in the output
    * without corrupting the later fields (review find: an unresolved
    * `grok_parse(text)` Column re-resolves against the ALREADY-REPLACED
    * frame, silently parsing the first field's value instead of the
    * line).
    */
  def parse(df: DataFrame, textCol: String, grok: String): DataFrame = {
    val fields = GrokParse.compile(grok).fields
    require(!fields.contains("_grok_matched") &&
      fields.forall(!_.startsWith("__graft")),
      s"reserved field name in grok pattern: $fields")
    val staged = df.withColumn("__graft_grok", grokCol(col(textCol), grok))
    val withFields = fields.zipWithIndex.foldLeft(staged) {
      case (d, (f, i)) => d.withColumn(f, col("__graft_grok").getItem(i))
    }
    withFields
      .withColumn("_grok_matched", col("__graft_grok").isNotNull)
      .drop("__graft_grok")
  }
}
