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

  /** `df` plus one string column per grok field and `_grok_matched`. */
  def parse(df: DataFrame, textCol: String, grok: String): DataFrame = {
    val fields = GrokParse.compile(grok).fields
    val arr = grokCol(col(textCol), grok)
    val withFields = fields.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
      d.withColumn(f, arr.getItem(i))
    }
    withFields.withColumn("_grok_matched", arr.isNotNull)
  }
}
