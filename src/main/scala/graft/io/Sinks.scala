package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output sinks beyond the parquet fan-out (SURVEY.md §2.1):
  * S10 NDJSON match sink, S11 extract sink (json/csv/text, optional
  * --unique dedup).
  */
object Sinks {

  /** NDJSON match sink (S10): one JSON object per match with the
    * reference's field set (sequential.rs:154-187): timestamp, source,
    * matched_text, match_type, data fields, prefix_len, cidr.
    */
  def ndjson(matched: DataFrame, path: String): Unit =
    matched
      .select(to_json(struct(matched.columns.map(col): _*)).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** Extract sink (S11): candidate dump as json/csv/text with optional
    * dedup on value (extract_cmd.rs:133-137, 241-271).
    */
  def extractDump(cands: DataFrame, path: String, format: String,
      unique: Boolean): Unit = {
    val base = cands.select(col("indicator_type").as("type"), col("value"))
    val out = if (unique) base.dropDuplicates("value") else base
    format match {
      case "json" =>
        out.select(to_json(struct(col("type"), col("value"))).as("v"))
          .write.mode(SaveMode.Overwrite).text(path)
      case "csv" =>
        out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      case "text" =>
        out.select(col("value")).write.mode(SaveMode.Overwrite).text(path)
      case other => throw new IllegalArgumentException(other)
    }
  }
}
