package graft.functions

import graft.extract.{IocScanner, ScanConfig}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression: `redact_iocs(text)` returns the text with every
  * extracted indicator span replaced by a typed placeholder
  * (`[REDACTED:ipv4]`, `[REDACTED:email]`, …) — the scrubbing step a
  * training-data pipeline runs over transcripts before the text reaches a
  * model: ONE scanner pass (identical candidate semantics to
  * `extract_iocs`, so what gets redacted is exactly what gets extracted),
  * byte-exact splicing on the UTF-8 span offsets, everything else
  * preserved verbatim.
  *
  * Overlapping spans (the email/email-domain double extraction, e.g.
  * `a@b.org` emitting both the email and the contained `b.org` domain)
  * collapse under a greedy leftmost-longest rule: spans sorted by
  * (start asc, end desc), a span is kept iff it starts at or after the
  * previous kept span's end — deterministic, and the outermost indicator
  * wins the placeholder.
  *
  * Scale shape: map-side, zero shuffle, stays inside whole-stage codegen
  * (static-call doGenCode like the other scan expressions).
  */
case class RedactIoCs(child: Expression, config: ScanConfig)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  @transient private lazy val scanner = new IocScanner(config)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "redact_iocs"

  override def nullSafeEval(input: Any): Any =
    RedactIoCs.redact(scanner, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scannerRef =
      ctx.addReferenceObj("scanner", scanner, classOf[IocScanner].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RedactIoCs.redact($scannerRef, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RedactIoCs =
    copy(child = newChild)
}

object RedactIoCs {
  // placeholder bytes per indicator type, precomputed (ASCII)
  private val placeholder: java.util.HashMap[String, Array[Byte]] = {
    val m = new java.util.HashMap[String, Array[Byte]]()
    graft.model.IndicatorType.all.foreach(t =>
      m.put(t, s"[REDACTED:$t]".getBytes("US-ASCII")))
    m
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def redact(scanner: IocScanner, text: UTF8String): UTF8String = {
    val len = text.numBytes()
    val scr = ExtractIoCs.tlScratch.get()
    val buf = ExtractIoCs.copyToScratch(scr, text)
    val iocs = scanner.scanInto(buf, len, scr.iocs, scr.scan)
    if (iocs.isEmpty) return text
    // spans by (start asc, end desc): greedy keep => leftmost-longest,
    // contained/overlapping later spans dropped
    val sorted = iocs.toArray
    java.util.Arrays.sort(sorted, (a: graft.model.Ioc, b: graft.model.Ioc) =>
      if (a.span_start != b.span_start) Integer.compare(a.span_start, b.span_start)
      else Integer.compare(b.span_end, a.span_end))
    val out = new java.io.ByteArrayOutputStream(len + 16 * sorted.length)
    var cur = 0
    var i = 0
    while (i < sorted.length) {
      val m = sorted(i)
      if (m.span_start >= cur) {
        out.write(buf, cur, m.span_start - cur)
        out.write(placeholder.get(m.indicator_type))
        cur = m.span_end
      } else if (m.span_end > cur) {
        // PARTIALLY-overlapping dropped span (reachable with word
        // boundaries off): its overhanging tail is still part of a
        // detected indicator — extend the redacted region instead of
        // copying those bytes verbatim into the "scrubbed" output
        cur = m.span_end
      }
      i += 1
    }
    out.write(buf, cur, len - cur)
    UTF8String.fromBytes(out.toByteArray)
  }
}
