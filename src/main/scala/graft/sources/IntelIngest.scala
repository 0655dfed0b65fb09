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
    // inference / S6 per-VALUE JSON types — graft.intel.DataValues).
    // A feed that arrives with `extra`/`extra_types` ALREADY built (the
    // variant-based readJson path) passes them through untouched. The
    // prebuilt check is TYPE-gated: a feed whose own column happens to be
    // NAMED "extra" (a plain string) must keep the legacy behavior of
    // being stringified into the extra map, not crash toEntries' upcast.
    val prebuilt = df.schema.fields.exists(f =>
      f.name == "extra" &&
        f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
    val known = Set("entry", "threat_level", "category", "source",
      "confidence", "to_ids", "comment", "attr_type", "attr_timestamp",
      "tags") ++ (if (prebuilt) Set("extra", "extra_types") else Set.empty)
    val extraCols = df.columns.filterNot(c =>
      known.contains(c) || c == keyCol).sorted
    val fieldType: Map[String, org.apache.spark.sql.types.DataType] =
      df.schema.fields.map(f => f.name -> f.dataType).toMap
    val extraExpr =
      if (prebuilt) col("extra")
      else if (extraCols.isEmpty)
        map().cast("map<string,string>")
      else
        map_filter(
          map(extraCols.flatMap(c =>
            Seq(lit(c), col(s"`$c`").cast("string"))): _*),
          (_, v) => v.isNotNull)
    val typesExpr =
      if (prebuilt)
        (if (df.columns.contains("extra_types")) col("extra_types")
         else map().cast("map<string,string>"))
      else if (extraCols.isEmpty)
        map().cast("map<string,string>")
      else
        map_filter(
          map(extraCols.flatMap(c =>
            Seq(lit(c),
              tagExpr(col(s"`$c`"), fieldType(c), inferStringCells))): _*),
          (_, v) => v.isNotNull)
    // ONE withColumns call: both expressions must resolve against the
    // ORIGINAL columns — sequential withColumn would make typesExpr see
    // the already-replaced map when the feed has its own "extra" column
    out = out.withColumns(Map("extra" -> extraExpr,
      "extra_types" -> typesExpr))
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
        // beyond-i64 integrals: in [0, u64::MAX] → Uint64 (as_u64 path),
        // negative or beyond u64 → Double (as_f64 fallback,
        // cli_utils.rs:218-223 — as_u64 fails past 2^64-1 too)
        when(c.isNull, lit(null).cast("string"))
          .when(c >= 0 && c <= lit(new java.math.BigDecimal(DataValues.U64Max)),
            lit(DataValues.U64))
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

  /** JSON feed: [{"key": ..., "data": {...}}] or NDJSON of the same (S6).
    *
    * DataValue typing is per VALUE, not per column (round-5 fix): Spark's
    * schema inference assigns one type per COLUMN, so a feed carrying
    * {"ttl": 2} and {"ttl": 2.5} would widen the column to double and
    * serialize the first entry's ttl as 2.0 — the reference types each
    * serde value independently (Int32(2) vs Double(2.5),
    * cli_utils.rs:213-243). The feed is therefore re-read as ONE VARIANT
    * per entry (`singleVariantColumn`; array feeds are split with
    * `variant_explode`), and every extra cell's string value AND DataValue
    * tag derive from its own variant member: BIGINT-family → i32
    * (as_i64 → truncating Int32), DECIMAL(p,0) in [0, u64::MAX] → u64,
    * negative/beyond-u64 integrals and all fractionals → f64,
    * BOOLEAN → bool, STRING → str (numeric-looking strings STAY strings),
    * nested OBJECT/ARRAY → `to_json` text tagged str (the flattened
    * passthrough form). The inferred read still provides the COLUMN SET;
    * dynamic keys containing '.' or quotes are not addressable by the
    * variant path and keep column-level typing via the legacy path.
    */
  def readJson(spark: SparkSession, path: String): DataFrame = {
    // multiLine selection by FILE SHAPE (round-5 review find): with
    // multiLine=true Spark parses each file as ONE json value, so an
    // NDJSON feed (one {key,data} object per line) would yield only its
    // FIRST record and the scan would silently miss every other
    // indicator. Array feeds (possibly pretty-printed across lines) need
    // multiLine=true; everything else is line-per-record NDJSON and must
    // use the default per-line parser. Peek at the first non-whitespace
    // byte to decide — feeds are driver-side small by design.
    val multiLine = firstNonWsByte(spark, path) == '['
    val reader = spark.read.option("multiLine", multiLine.toString)
    // empty feeds are legitimate (automation delivering an empty file or
    // '[]'; IntelStore builds empty databases fine) — json schema
    // inference throws on them, and '[]' infers zero columns; both become
    // an empty normalized frame instead of a crash (round-5 review find)
    val raw =
      try reader.json(path)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer") =>
          return emptyNormalized(spark)
      }
    if (raw.columns.isEmpty) return emptyNormalized(spark)
    val nested = raw.columns.contains("data")
    val flat = if (nested) raw.select(col("key"), col("data.*")) else raw
    val keyCol =
      if (flat.columns.contains("entry")) "entry"
      else if (flat.columns.contains("key")) "key"
      else flat.columns.head
    val known = Set("threat_level", "category", "source", "confidence",
      "to_ids", "comment", "attr_type", "attr_timestamp", "tags")
    val extraCols =
      flat.columns.filterNot(c => known.contains(c) || c == keyCol).sorted
    // keys the variant JSON-path grammar cannot address safely (the path
    // is interpolated into a SQL string literal, so '\' would be
    // re-escaped by the SQL parser and silently corrupt the path)
    val pathSafe = (keyCol +: extraCols).forall(c =>
      !c.exists(ch => ch == '.' || ch == '\'' || ch == '"' || ch == '[' ||
        ch == ']' || ch == '$' || ch == '\\'))
    if (extraCols.isEmpty || !pathSafe)
      return normalize(flat, inferStringCells = false)

    val v0 = spark.read.format("json")
      .option("multiLine", multiLine.toString)
      .option("singleVariantColumn", "__v").load(path)
    val view = s"graft_feed_v_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    v0.createOrReplaceTempView(view)
    // one variant per ENTRY: array files parse as a single ARRAY variant
    // (split it); NDJSON files parse as one OBJECT variant per line
    val vRows = spark.sql(
      s"""SELECT __v AS v FROM $view
         |WHERE schema_of_variant(__v) NOT LIKE 'ARRAY%'
         |UNION ALL
         |SELECT e.value AS v FROM $view,
         |LATERAL variant_explode(__v) AS e
         |WHERE schema_of_variant(__v) LIKE 'ARRAY%'""".stripMargin)
    spark.catalog.dropTempView(view)

    def vpath(c: String): String =
      if (nested && c != "key") s"$$.data.$c" else s"$$.$c"
    def member(c: String) = expr(s"variant_get(v, '${vpath(c)}')")
    def vschema(c: String) = expr(s"schema_of_variant(variant_get(v, '${vpath(c)}'))")
    def valueOf(c: String): org.apache.spark.sql.Column = {
      val sv = vschema(c)
      when(sv.startsWith("OBJECT") || sv.startsWith("ARRAY"),
        to_json(member(c)))
        .otherwise(member(c).cast("string"))
    }
    def tagOf(c: String): org.apache.spark.sql.Column = {
      val sv = vschema(c)
      when(sv.isNull || sv === "VOID", lit(null).cast("string"))
        .when(sv.isin("TINYINT", "SMALLINT", "INT", "BIGINT"),
          lit(graft.intel.DataValues.I32))
        .when(sv === "BOOLEAN", lit(graft.intel.DataValues.BOOL))
        .when(sv.isin("DOUBLE", "FLOAT"), lit(graft.intel.DataValues.F64))
        .when(sv.startsWith("DECIMAL") && sv.endsWith(",0)"),
          when(member(c).cast("decimal(38,0)") >= 0 &&
            member(c).cast("decimal(38,0)") <=
              lit(new java.math.BigDecimal(graft.intel.DataValues.U64Max)),
            lit(graft.intel.DataValues.U64))
            .otherwise(lit(graft.intel.DataValues.F64)))
        .when(sv.startsWith("DECIMAL"), lit(graft.intel.DataValues.F64))
        .otherwise(lit(graft.intel.DataValues.STR))
    }
    val fixed = flat.columns.filter(known.contains).toSeq
    val assembled = vRows.select(
      (valueOf(keyCol).as(keyCol) +:
        fixed.map(c => valueOf(c).as(c))) :+
        map_filter(
          map(extraCols.toSeq.flatMap(c => Seq(lit(c), valueOf(c))): _*),
          (_, x) => x.isNotNull).as("extra") :+
        map_filter(
          map(extraCols.toSeq.flatMap(c => Seq(lit(c), tagOf(c))): _*),
          (_, x) => x.isNotNull).as("extra_types"): _*)
    normalize(assembled, inferStringCells = false)
  }

  /** First non-whitespace byte of `path` (a file, or the first file of a
    * directory) via the Hadoop FS API — works for any Spark-readable
    * location. 0 when empty/unreadable (callers treat that as NDJSON).
    */
  /** The normalized frame of a zero-entry feed (schema identical to a
    * normalized non-empty read).
    */
  private def emptyNormalized(spark: SparkSession): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("entry",
        org.apache.spark.sql.types.StringType)))
    normalize(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      inferStringCells = false)
  }

  private def firstNonWsByte(spark: SparkSession, path: String): Byte = {
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).find(s => s.isFile && s.getLen > 0)
            .map(_.getPath).orNull
        else p
      if (file == null) return 0
      val in = fs.open(file)
      try {
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) {
            val b = buf(i)
            if (b != ' ' && b != '\n' && b != '\r' && b != '\t') return b
            i += 1
          }
          n = in.read(buf)
        }
        0
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => 0 }
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
