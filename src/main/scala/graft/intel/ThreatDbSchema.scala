package graft.intel

import graft.model.IntelEntry

/** ThreatDB v1 schema validation — the `builder.with_schema("threatdb")`
  * analog (reference schemas/threatdb-v1.schema.json, enforced by
  * matchy/src/schema_validation.rs): required threat_level in
  * {critical, high, medium, low, unknown}, required non-empty category and
  * source, optional confidence in 0..100.
  */
object ThreatDbSchema {

  val threatLevels: Set[String] =
    Set("critical", "high", "medium", "low", "unknown")

  /** Returns the list of violations (empty = valid). */
  def violations(e: IntelEntry): List[String] = {
    var errs = List.empty[String]
    if (!threatLevels.contains(e.threat_level))
      errs ::= s"threat_level '${e.threat_level}' not in ${threatLevels.mkString("{", ",", "}")}"
    if (e.category == null || e.category.isEmpty)
      errs ::= "category is required"
    if (e.source == null || e.source.isEmpty)
      errs ::= "source is required"
    if (e.confidence < 0 || e.confidence > 100)
      errs ::= s"confidence ${e.confidence} outside 0..100"
    errs.reverse
  }

  def isValid(e: IntelEntry): Boolean = violations(e).isEmpty

  /** Validate a feed; Left(first-violations-per-entry) on any failure —
    * the build-time hard error of the reference builder.
    */
  def validate(entries: Seq[IntelEntry]): Either[Seq[(String, String)], Seq[IntelEntry]] = {
    val bad = entries.flatMap(e => violations(e).headOption.map(v => e.entry -> v))
    if (bad.isEmpty) Right(entries) else Left(bad)
  }
}
