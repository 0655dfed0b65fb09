package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression: `grok_parse(text)` for one compiled grok pattern —
  * the structured-log field parser of the north rule's "grok/regex parse"
  * family. A grok pattern is literal text interleaved with
  * `%{NAME:field}` tokens (`%{NAME}` matches without capturing); it
  * compiles once to a single anchored regex whose capture groups are the
  * named fields, and each row runs ONE match that yields ALL fields —
  * never the per-field `regexp_extract` chain that re-executes the same
  * regex m times per row.
  *
  * Returns `array<string>` in field order, or NULL when the line does not
  * match the pattern (the parse-failure signal a dead-letter route
  * filters on; a matched-but-empty optional group is an empty string).
  * Downstream field projections (`arr[0] AS ts, arr[1] AS level, …`)
  * stay one evaluation per row: the expression is deterministic, so
  * whole-stage codegen's subexpression elimination computes the array
  * once per row even when every field references it —
  * `GrokParseSpec` pins that with an invocation counter.
  *
  * Scale note: `java.util.regex` needs a `CharSequence`, so each row
  * pays one UTF8String→String decode — the identical cost Spark's own
  * `RegExpExtract` pays, but here once per row instead of once per
  * field. The patterns this compiles are anchored and non-backtracking
  * for the vendored vocabulary below (bounded quantifiers over disjoint
  * character classes), so match cost is linear in line length.
  */
case class GrokParse(child: Expression, grokPattern: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  // compile at construction: an invalid pattern or unknown %{NAME} must
  // fail at ANALYSIS time (query construction), not per-task at runtime
  @transient private lazy val compiled = GrokParse.compile(grokPattern)
  locally { val _ = compiled.fields } // force: bad patterns fail on the driver

  // the compiled Pattern rides the codegen reference array / task binary
  // directly (java.util.regex.Pattern is Serializable), so the hot path
  // pays ZERO per-row cache probes (review find: a ConcurrentHashMap get
  // per row keyed by the full regex string is pure overhead)
  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(compiled.regex)

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true // non-matching lines yield NULL
  override def prettyName: String = "grok_parse"

  override def nullSafeEval(input: Any): Any =
    GrokParse.matchGroups(input.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("grokPattern", pattern,
      "java.util.regex.Pattern")
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.GrokParse.matchGroups($c, $patRef);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): GrokParse =
    copy(child = newChild)
}

object GrokParse {

  /** The vendored pattern vocabulary — the common core of the public
    * grok pattern sets (logstash-patterns-core), each fragment written
    * non-backtracking (disjoint char classes, no nested unbounded
    * quantifiers). Group syntax inside fragments must be NON-capturing
    * (`(?:…)`) so field→group numbering stays 1:1.
    */
  val vocabulary: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "UUID" -> "[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "IPV4" -> "\\d{1,3}(?:\\.\\d{1,3}){3}",
    "HOSTNAME" -> "[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?(?:\\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*",
    "LOGLEVEL" -> "(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERR(?:OR)?|CRIT(?:ICAL)?|FATAL|SEVERE)",
    "TIMESTAMP_ISO8601" -> "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:[.,]\\d{1,9})?(?:Z|[+-]\\d{2}:?\\d{2})?",
    "QUOTEDSTRING" -> "\"[^\"]*\""
  )

  final case class Compiled(regex: String, fields: Seq[String])

  private val tokenRe =
    java.util.regex.Pattern.compile("%\\{(\\w+)(?::(\\w+))?\\}")

  /** Compile a grok pattern to (anchored regex, field names). Literal
    * text between tokens is escaped character-wise (no \Q\E, so the
    * produced regex is also portable to RE2-family engines).
    */
  def compile(grok: String): Compiled = {
    val m = tokenRe.matcher(grok)
    val out = new StringBuilder("^")
    val fields = Seq.newBuilder[String]
    var last = 0
    while (m.find()) {
      out.append(escapeLiteral(grok.substring(last, m.start())))
      val frag = vocabulary.getOrElse(m.group(1),
        throw new IllegalArgumentException(
          s"unknown grok pattern %{${m.group(1)}} — vocabulary: " +
            vocabulary.keys.toSeq.sorted.mkString(", ")))
      Option(m.group(2)) match {
        case Some(field) => fields += field; out.append('(').append(frag).append(')')
        case None => out.append("(?:").append(frag).append(')')
      }
      last = m.end()
    }
    out.append(escapeLiteral(grok.substring(last))).append('$')
    val f = fields.result()
    require(f.nonEmpty, s"grok pattern captures no fields: $grok")
    require(f.distinct.size == f.size, s"duplicate field names in: $grok")
    // a %{...} the token grammar could NOT parse (dotted field names,
    // type suffixes like %{INT:n:int}, unclosed braces) must be a loud
    // error, not literal text that can never match a line (review find)
    val leftover = "%\\{".r.findFirstMatchIn(
      grok.replaceAll(tokenRe.pattern(), ""))
    require(leftover.isEmpty,
      s"malformed %{...} token in grok pattern (supported form: " +
        s"%{NAME} or %{NAME:field}, \\w+ names only): $grok")
    Compiled(out.toString, f)
  }

  private def escapeLiteral(s: String): String = {
    val b = new StringBuilder
    s.foreach { ch =>
      if (ch.isLetterOrDigit || ch == ' ' || ch == '_') b.append(ch)
      else b.append('\\').append(ch)
    }
    b.toString
  }

  /** Invocation counter — a TEST hook: GrokParseSpec asserts codegen
    * subexpression elimination runs ONE match per row, not per field.
    * LongAdder, not AtomicLong: a contended CAS cache line would tax
    * every scan thread on the hot path; striped adds are ~free.
    */
  val invocations = new java.util.concurrent.atomic.LongAdder

  /** Static entry shared by interpreted eval and generated code: one
    * full-line match; group array on success, null on parse failure.
    * Takes the COMPILED Pattern (carried by the expression itself) — no
    * per-row cache probes.
    */
  def matchGroups(text: UTF8String, p: java.util.regex.Pattern): ArrayData = {
    invocations.increment()
    val m = p.matcher(text.toString)
    if (!m.matches()) return null
    val n = m.groupCount()
    val arr = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val g = m.group(i + 1)
      arr(i) = if (g == null) null else UTF8String.fromString(g)
      i += 1
    }
    new GenericArrayData(arr)
  }
}
