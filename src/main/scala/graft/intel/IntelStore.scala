package graft.intel

import graft.model.IntelEntry
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Persisted form of a compiled intel database (the .mxy analog, S9): a
  * parquet table of classified entries. The mmap/offset machinery of the
  * reference is replaced by rebuilding the broadcast matcher structures at
  * load — build is O(entries) and entries are small by design, the analog
  * of the reference's <1ms mmap open (DEVELOPMENT.md:198-206) at Spark's
  * granularity. Parquet dictionary encoding plays the role of the
  * content-addressed data-section dedup (mmdb_builder.rs:274-289).
  */
object IntelStore {

  def save(spark: SparkSession, db: IntelDb, path: String): Unit = {
    import spark.implicits._
    val rows = db.entries.toSeq.map { m =>
      (db.databaseId, m.entry, m.entryType, m.threatLevel, m.category,
        m.source, m.confidence, db.caseInsensitive,
        m.toIds, m.comment, m.attrType, m.attrTimestamp, m.tags, m.extra,
        m.extraTypes)
    }
    rows.toDF("database_id", "entry", "entry_type", "threat_level",
      "category", "source", "confidence", "case_insensitive",
      "to_ids", "comment", "attr_type", "attr_timestamp", "tags", "extra",
      "extra_types")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
    // sidecar metadata (underscore-prefixed: invisible to parquet readers)
    // carries database_id + match mode even for a legitimately EMPTY feed —
    // the reference builds and opens empty databases fine
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$path/_graft_meta.json"), true)
    // ids are arbitrary caller strings: write them JSON-escaped, or a quote
    // in the id tears the sidecar and load()/validate() silently recover a
    // truncated id (round-5 review find; inspectJson already escaped)
    out.write(
      s"""{"database_id":"${jsonEscape(db.databaseId)}","case_insensitive":${db.caseInsensitive}}"""
        .getBytes("UTF-8"))
    out.close()
  }

  /** Minimal JSON string escape for the sidecar/inspect surfaces. */
  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c    => c.toString
  }

  /** Inverse of [[jsonEscape]] for sidecar read-back. */
  private def jsonUnescape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case e => sb.append(e); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape-aware sidecar id pattern: `[^"]*` would stop mid-escape and
    * return a truncated id for escaped quotes/backslashes.
    */
  private val SidecarIdRe = "\"database_id\":\"((?:[^\"\\\\]|\\\\.)*)\"".r

  def load(spark: SparkSession, path: String): IntelDb = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, coalesce}
    val df = spark.read.parquet(path)
    // pre-round-3 stores lack the MISP metadata columns — default them
    def optCol(name: String, default: org.apache.spark.sql.Column) =
      if (df.columns.contains(name)) col(name) else default
    val rows = df.select(col("database_id"), col("entry"),
      col("threat_level"), col("category"), col("source"), col("confidence"),
      col("case_insensitive"),
      optCol("to_ids", lit(null).cast("boolean")).as("to_ids"),
      coalesce(optCol("comment", lit("")), lit("")).as("comment"),
      coalesce(optCol("attr_type", lit("")), lit("")).as("attr_type"),
      coalesce(optCol("attr_timestamp", lit(-1L)), lit(-1L))
        .as("attr_timestamp"),
      coalesce(optCol("tags", lit("")), lit("")).as("tags"),
      coalesce(
        optCol("extra",
          org.apache.spark.sql.functions.map()
            .cast("map<string,string>")),
        org.apache.spark.sql.functions.map().cast("map<string,string>"))
        .as("extra"),
      // DataValue tags (round-5): a legacy store without the column gets
      // an EMPTY tag map, which the NDJSON renderer treats as
      // "re-infer CSV-style per value" (DataValues.typedJsonObject) — the
      // closest analog of how the reference would have typed that feed
      coalesce(
        optCol("extra_types",
          org.apache.spark.sql.functions.map()
            .cast("map<string,string>")),
        org.apache.spark.sql.functions.map().cast("map<string,string>"))
        .as("extra_types"))
      .as[(String, String, String, String, String, Int, Boolean,
        Option[Boolean], String, String, Long, String,
        Map[String, String], Map[String, String])]
      .collect()
    val (databaseId, ci) =
      if (rows.nonEmpty) (rows.head._1, rows.head._7)
      else {
        // empty feed: recover id + mode from the sidecar (save() always
        // writes it; a store with neither rows nor sidecar is corrupt)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
        val p = new org.apache.hadoop.fs.Path(s"$path/_graft_meta.json")
        require(fs.exists(p), s"empty intel store without metadata at $path")
        val in = fs.open(p)
        val txt = new String(in.readAllBytes(), "UTF-8")
        in.close()
        val id = SidecarIdRe.findFirstMatchIn(txt)
          .map(m => jsonUnescape(m.group(1)))
          .getOrElse(sys.error(s"bad store metadata at $path"))
        (id, txt.contains("\"case_insensitive\":true"))
      }
    IntelDb.build(databaseId,
      rows.toSeq.map(r => IntelEntry(r._2, r._3, r._4, r._5, r._6,
        to_ids = r._8, comment = r._9, attr_type = r._10,
        attr_timestamp = r._11, tags = r._12, extra = r._13,
        extra_types = r._14)), ci)
  }

  /** `matchy validate` analog (validation.rs ValidationLevel semantics
    * mapped onto this engine's store format): STANDARD checks structural
    * integrity — readable parquet, sidecar present/consistent, required
    * fields non-null, every entry classifiable (an unclassifiable entry is
    * silently dropped by IntelDb.build, so it is surfaced HERE as an
    * error), ThreatDB-v1 schema conformance; STRICT adds the deep-analysis
    * analogs — duplicate keys (redundancy), globs with no literal core
    * (AC-prefilter hazard, the PARAGLOB-consistency analog), out-of-range
    * confidence. Offset/cycle/UTF-8 checks of the reference's mmap format
    * have no analog: parquet integrity is the storage layer's job.
    */
  final case class ValidationReport(
      errors: Seq[String],
      warnings: Seq[String],
      info: Seq[String],
      entries: Int,
      schemaChecked: Int,
      schemaFailures: Int
  ) {
    def ok: Boolean = errors.isEmpty
  }

  def validate(spark: SparkSession, path: String,
      strict: Boolean = true): ValidationReport = {
    import scala.collection.mutable.ArrayBuffer
    val errors = ArrayBuffer[String]()
    val warnings = ArrayBuffer[String]()
    val info = ArrayBuffer[String]()
    val df =
      try spark.read.parquet(path)
      catch {
        case scala.util.control.NonFatal(e) =>
          return ValidationReport(
            Seq(s"unreadable store: ${e.getMessage}"), Nil, Nil, 0, 0, 0)
      }
    val required = Seq("database_id", "entry", "entry_type", "threat_level",
      "category", "source", "confidence", "case_insensitive")
    val missing = required.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      return ValidationReport(
        Seq(s"missing required columns: ${missing.mkString(", ")}"),
        Nil, Nil, 0, 0, 0)
    // column TYPES must match too, or the typed row reads below throw
    // ClassCastException out of the diagnoser on exactly the malformed
    // store it exists to report (round-5 review find: an external writer
    // with confidence as int64 crashed validate instead of failing it)
    val expectedTypes = Map(
      "confidence" -> "integer", "case_insensitive" -> "boolean"
    ).withDefaultValue("string")
    val drifted = required.flatMap { c =>
      val actual = df.schema(c).dataType.typeName
      if (actual == expectedTypes(c)) None
      else Some(s"column '$c' has type $actual, expected ${expectedTypes(c)}")
    }
    if (drifted.nonEmpty)
      return ValidationReport(drifted, Nil, Nil, 0, 0, 0)
    val rows = df.select(required.head, required.tail: _*).collect()
    // sidecar consistency (the analog of the header/metadata checks)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/_graft_meta.json")
    if (!fs.exists(metaPath)) {
      if (rows.isEmpty)
        errors += "empty store without _graft_meta.json sidecar (corrupt)"
      else warnings += "missing _graft_meta.json sidecar (pre-round-2 store?)"
    } else {
      val in = fs.open(metaPath)
      val txt = new String(in.readAllBytes(), "UTF-8")
      in.close()
      val sidecarId = SidecarIdRe.findFirstMatchIn(txt)
        .map(m => jsonUnescape(m.group(1)))
      if (sidecarId.isEmpty) errors += "sidecar missing database_id"
      else if (rows.nonEmpty && !rows.forall(_.getString(0) == sidecarId.get))
        errors += s"database_id mismatch: sidecar=${sidecarId.get} vs rows"
    }
    var schemaFailures = 0
    rows.zipWithIndex.foreach { case (r, i) =>
      val entry = r.getString(1)
      if (entry == null || entry.isEmpty)
        errors += s"row $i: null/empty entry key"
      else {
        if (IntelDb.classify(entry).isEmpty)
          errors += s"row $i: unclassifiable entry '$entry' " +
            "(invalid forced glob/ip — IntelDb.build would drop it)"
        // corrupt stores are exactly what validate() diagnoses: a null in
        // a primitive column must become a reported error, never an NPE
        // out of Row.getInt (round-5 review find)
        if (r.isNullAt(6)) {
          schemaFailures += 1
          errors += s"row $i: null confidence"
        } else {
          val viols = ThreatDbSchema.violations(graft.model.IntelEntry(
            entry, r.getString(3), r.getString(4), r.getString(5),
            r.getInt(6)))
          if (viols.nonEmpty) {
            schemaFailures += 1
            viols.foreach(v => errors += s"row $i: $v")
          }
        }
        if (r.isNullAt(7))
          errors += s"row $i: null case_insensitive"
      }
    }
    if (strict && rows.nonEmpty) {
      val keys = rows.map(_.getString(1)).filter(_ != null)
      keys.groupBy(identity).filter(_._2.length > 1).keys.foreach(k =>
        warnings += s"duplicate entry key '$k' (redundant rows)")
      keys.foreach { k =>
        IntelDb.classify(k) match {
          case Some(IntelDb.GlobEntry(p)) =>
            Glob.parse(p, caseInsensitive = false) match {
              case Right(g) if g.prefilter.isEmpty =>
                warnings += s"glob '$p' has no literal core: every string " +
                  "candidate must run the matcher (AC prefilter cannot help)"
              case _ => ()
            }
          case _ => ()
        }
      }
      val ciVals = rows.filterNot(_.isNullAt(7)).map(_.getBoolean(7)).distinct
      if (ciVals.length > 1)
        errors += "inconsistent case_insensitive flag across rows"
    }
    info += s"entries=${rows.length}"
    info += "database_type=ThreatDB-v1"
    ValidationReport(errors.toSeq, warnings.toSeq, info.toSeq,
      rows.length, rows.length, schemaFailures)
  }

  /** `matchy inspect` analog: database statistics — entry counts by type
    * (the reference's per-section counts), capability flags, metadata
    * cardinalities and the dynamic-metadata footprint.
    */
  final case class InspectReport(
      databaseId: String,
      caseInsensitive: Boolean,
      entries: Int,
      ipEntries: Int,
      literalEntries: Int,
      globEntries: Int,
      hasIpSection: Boolean,
      hasStringSection: Boolean,
      distinctCategories: Int,
      distinctSources: Int,
      minConfidence: Int,
      maxConfidence: Int,
      entriesWithExtra: Int,
      distinctExtraKeys: Int)

  def inspect(db: IntelDb): InspectReport = {
    val es = db.entries
    def cnt(t: String) = es.count(_.entryType == t)
    InspectReport(
      db.databaseId,
      db.caseInsensitive,
      es.length,
      cnt("ip"), cnt("literal"), cnt("glob"),
      db.hasIpSection, db.hasStringSection,
      es.iterator.map(_.category).toSet.size,
      es.iterator.map(_.source).toSet.size,
      if (es.isEmpty) 0 else es.iterator.map(_.confidence).min,
      if (es.isEmpty) 0 else es.iterator.map(_.confidence).max,
      es.count(_.extra.nonEmpty),
      es.iterator.flatMap(_.extra.keysIterator).toSet.size)
  }

  /** One-line JSON form of `inspect` (CLI-ish surface). */
  def inspectJson(db: IntelDb): String = {
    val r = inspect(db)
    // database ids are arbitrary caller strings — escape for valid JSON
    val id = jsonEscape(r.databaseId)
    s"""{"database_id":"$id","case_insensitive":${r.caseInsensitive},""" +
      s""""entries":${r.entries},"ip_entries":${r.ipEntries},""" +
      s""""literal_entries":${r.literalEntries},"glob_entries":${r.globEntries},""" +
      s""""has_ip_section":${r.hasIpSection},"has_string_section":${r.hasStringSection},""" +
      s""""distinct_categories":${r.distinctCategories},"distinct_sources":${r.distinctSources},""" +
      s""""min_confidence":${r.minConfidence},"max_confidence":${r.maxConfidence},""" +
      s""""entries_with_extra":${r.entriesWithExtra},"distinct_extra_keys":${r.distinctExtraKeys}}"""
  }
}

/** Point-lookup convenience (S12, the `matchy query` analog): evaluate the
  * same broadcast structures driver-side for a single key; returns matched
  * entry metadata (empty = NotFound, the CLI's exit-code-1 case).
  */
object QueryApi {

  final case class QueryHit(databaseId: String, entry: String,
      entryType: String, matchType: String, prefixLen: Int,
      threatLevel: String, category: String, source: String, confidence: Int)

  /** Dispatch like the reference (database.rs:760-764): parse as IP first,
    * else string path.
    */
  def query(db: IntelDb, key: String): Seq[QueryHit] = {
    val asCidr = Cidr.parse(key)
    if (asCidr != null && !key.contains("/")) {
      val isV6 = key.indexOf(':') >= 0
      val hit = db.lookupIp(key, isV6)
      if (hit == null) Nil
      else {
        val m = db.entries(hit._1)
        Seq(QueryHit(db.databaseId, m.entry, m.entryType, "ip", hit._2,
          m.threatLevel, m.category, m.source, m.confidence))
      }
    } else {
      db.lookupString(key).toSeq.map { idx =>
        val m = db.entries(idx)
        QueryHit(db.databaseId, m.entry, m.entryType, "pattern", -1,
          m.threatLevel, m.category, m.source, m.confidence)
      }
    }
  }

  /** Multi-database query (L8). */
  def query(dbs: Seq[IntelDb], key: String): Seq[QueryHit] =
    dbs.flatMap(db => query(db, key))
}
