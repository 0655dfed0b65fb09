package graft.sources

import graft.model.IntelEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Intel feed ingestion (SURVEY.md §2.1 S5-S7): CSV with an entry/key
  * column, JSON array of {key, data}, and plain text (one entry per line,
  * '#' comments skipped) — the auto-build inputs of the reference
  * (bin/commands/match_cmd.rs:38-155). The builder's "schema" analog is the
  * typed IntelEntry projection with ThreatDB defaults for missing fields.
  */
object IntelIngest {

  private val defaults = Map(
    "threat_level" -> "unknown", "category" -> "unknown",
    "source" -> "unknown")

  /** Normalize an arbitrary feed DataFrame into the IntelEntry shape.
    * Accepts `entry` or `key` as the key column; fills ThreatDB defaults.
    *
    * @param inferStringCells when true (CSV feeds: every cell is an
    *   untyped string) string-typed extra columns get the reference's
    *   per-cell DataValue inference (match_cmd.rs:83-93); when false
    *   (JSON feeds: types are native, cli_utils.rs:213-243) a string
    *   stays a string even when it looks numeric.
    */
  def normalize(df: DataFrame,
      inferStringCells: Boolean = true): DataFrame = {
    val keyCol =
      if (df.columns.contains("entry")) "entry"
      else if (df.columns.contains("key")) "key"
      else df.columns.head
    var out = df.withColumnRenamed(keyCol, "entry")
    defaults.foreach { case (c, d) =>
      out =
        if (out.columns.contains(c)) out.withColumn(c, coalesce(col(c).cast("string"), lit(d)))
        else out.withColumn(c, lit(d))
    }
    out = if (out.columns.contains("confidence"))
      out.withColumn("confidence", coalesce(col("confidence").cast("int"), lit(0)))
    else out.withColumn("confidence", lit(0))
    // optional attribute-level metadata (MISP fidelity fields): honored when
    // the feed carries them, defaulted to "absent" otherwise
    out = if (out.columns.contains("to_ids"))
      out.withColumn("to_ids", col("to_ids").cast("boolean"))
    else out.withColumn("to_ids", lit(null).cast("boolean"))
    Seq("comment" -> "", "attr_type" -> "", "tags" -> "").foreach {
      case (c, d) =>
        out =
          if (out.columns.contains(c))
            out.withColumn(c, coalesce(col(c).cast("string"), lit(d)))
          else out.withColumn(c, lit(d))
    }
    out = if (out.columns.contains("attr_timestamp"))
      out.withColumn("attr_timestamp",
        coalesce(col("attr_timestamp").cast("long"), lit(-1L)))
    else out.withColumn("attr_timestamp", lit(-1L))
    // dynamic metadata passthrough (reference: arbitrary per-entry
    // HashMap<String, DataValue>, matchy-data-format/src/lib.rs:49-77):
    // every feed column OUTSIDE the fixed shape survives as a string
    // key/value in `extra` (null values dropped) instead of being lost,
    // with its DataValue type captured in `extra_types` (S5 per-cell CSV
    // inference / S6 native JSON types — graft.intel.DataValues)
    val known = Set("entry", "threat_level", "category", "source",
      "confidence", "to_ids", "comment", "attr_type", "attr_timestamp",
      "tags")
    val extraCols = df.columns.filterNot(c =>
      known.contains(c) || c == keyCol).sorted
    val fieldType: Map[String, org.apache.spark.sql.types.DataType] =
      df.schema.fields.map(f => f.name -> f.dataType).toMap
    val extraExpr =
      if (extraCols.isEmpty)
        map().cast("map<string,string>")
      else
        map_filter(
          map(extraCols.flatMap(c =>
            Seq(lit(c), col(s"`$c`").cast("string"))): _*),
          (_, v) => v.isNotNull)
    val typesExpr =
      if (extraCols.isEmpty)
        map().cast("map<string,string>")
      else
        map_filter(
          map(extraCols.flatMap(c =>
            Seq(lit(c),
              tagExpr(col(s"`$c`"), fieldType(c), inferStringCells))): _*),
          (_, v) => v.isNotNull)
    out = out.withColumn("extra", extraExpr)
      .withColumn("extra_types", typesExpr)
    out.select("entry", "threat_level", "category", "source", "confidence",
      "to_ids", "comment", "attr_type", "attr_timestamp", "tags", "extra",
      "extra_types")
      .where(col("entry").isNotNull && length(col("entry")) > 0)
  }

  /** DataValue tag for one extra cell (null when the cell is null —
    * matching the absent-key rule of `extra`).
    *
    *  - A string-typed source column (every CSV cell) gets the reference's
    *    per-cell inference (match_cmd.rs:83-93) via [[inferTagUdf]] — a
    *    tiny deterministic UDF, acceptable here because feeds are the
    *    broadcast-small side evaluated once at ingest, never per scan row,
    *    and the Rust parse grammars are not expressible in builtins.
    *  - A natively-typed column (spark.read.json) maps by Spark type the
    *    way cli_utils.rs:213-243 maps serde_json values: integrals →
    *    Int32 (truncating), decimals beyond i64 → Uint64, floats →
    *    Double, booleans → Bool. Nested arrays/structs are flattened to
    *    their string cast (pre-existing behavior) and tagged String.
    */
  private def tagExpr(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType,
      inferStringCells: Boolean): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    import graft.intel.DataValues
    dt match {
      case StringType if inferStringCells => inferTagUdf(c)
      case StringType => when(c.isNotNull, lit(DataValues.STR))
      case ByteType | ShortType | IntegerType | LongType =>
        when(c.isNotNull, lit(DataValues.I32))
      case d: DecimalType if d.scale == 0 =>
        // beyond-i64 integrals: non-negative → Uint64 (as_u64 path),
        // negative → Double (as_f64 fallback, cli_utils.rs:218-223)
        when(c.isNull, lit(null).cast("string"))
          .when(c >= 0, lit(DataValues.U64))
          .otherwise(lit(DataValues.F64))
      case FloatType | DoubleType | _: DecimalType =>
        when(c.isNotNull, lit(DataValues.F64))
      case BooleanType => when(c.isNotNull, lit(DataValues.BOOL))
      case _ => when(c.isNotNull, lit(DataValues.STR))
    }
  }

  private val inferTagUdf =
    udf((s: String) => graft.intel.DataValues.inferTag(s))

  /** CSV feed: header row, entry/key column + metadata columns (S5). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read.option("header", "true").csv(path))

  /** JSON feed: [{"key": ..., "data": {...}}] or NDJSON of the same (S6). */
  def readJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val flat =
      if (raw.columns.contains("data"))
        raw.select(col("key"), col("data.*"))
      else raw
    normalize(flat, inferStringCells = false)
  }

  /** Text feed: one entry per line, '#' comments and blanks skipped (S7). */
  def readText(spark: SparkSession, path: String): DataFrame =
    normalize(
      spark.read.text(path)
        .select(trim(col("value")).as("entry"))
        .where(length(col("entry")) > 0 && !col("entry").startsWith("#")))

  /** Collect a normalized feed to typed entries (driver-side: feeds are
    * small by design — the broadcast side of the pipeline).
    */
  def toEntries(df: DataFrame): Seq[IntelEntry] = {
    import df.sparkSession.implicits._
    df.as[IntelEntry].collect().toSeq
  }
}
