package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression: `refang_text(text)` — normalize DEFANGED
  * indicators back to their live form before extraction, the way
  * threat-intel text defuses IoCs so they can't be clicked:
  * `evil[.]com` / `evil(.)com` / `evil[dot]com` → `evil.com`,
  * `bob[at]x.org` / `bob(at)x.org` / `[@]` → `@`,
  * `hxxp`/`hXXp` → `http` (hxxps → https falls out),
  * `[:]` → `:`, `[://]` → `://`.
  *
  * ONE byte-level pass (the scan engine's cost model — not a chain of
  * per-row regex passes), allocation-free when nothing is defanged (the
  * common case on clean transcripts: returns the input object). Compose
  * as `extract_iocs(refang_text(text))`; spans then index the REFANGED
  * text — document when carrying spans back to the original.
  *
  * This is a beyond-reference addition (the reference extractor has no
  * defang handling); the replacement set is the conservative common core,
  * deliberately excluding guessy forms like bare "dot".
  */
case class RefangText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "refang_text"

  override def nullSafeEval(input: Any): Any =
    RefangText.refang(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RefangText.refang($c);")

  override protected def withNewChildInternal(newChild: Expression): RefangText =
    copy(child = newChild)
}

object RefangText {
  // (pattern, replacement); longest-first among same-prefix patterns so
  // "[://]" wins over "[:]" and "[dot]" over nothing; alpha bytes match
  // ASCII-case-insensitively
  private val rules: Array[(Array[Byte], Array[Byte])] = Array(
    "[://]" -> "://",
    "[dot]" -> ".",
    "(dot)" -> ".",
    "[at]" -> "@",
    "(at)" -> "@",
    "[.]" -> ".",
    "(.)" -> ".",
    "{.}" -> ".",
    "[@]" -> "@",
    "[:]" -> ":",
    "hxxp" -> "http"
  ).map { case (p, r) => p.getBytes("US-ASCII") -> r.getBytes("US-ASCII") }

  private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  private def matchesAt(buf: Array[Byte], len: Int, pos: Int,
      pat: Array[Byte]): Boolean = {
    if (pos + pat.length > len) return false
    var i = 0
    while (i < pat.length) {
      if (lower(buf(pos + i)) != pat(i)) return false
      i += 1
    }
    true
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def refang(text: UTF8String): UTF8String = {
    val len = text.numBytes()
    val scr = ExtractIoCs.tlScratch.get()
    val buf = ExtractIoCs.copyToScratch(scr, text)
    // fast reject: a rule can only start at '[', '(', '{', 'h' or 'H'
    var i = 0
    var first = -1
    while (first < 0 && i < len) {
      val b = buf(i)
      if (b == '[' || b == '(' || b == '{' || b == 'h' || b == 'H') {
        var r = 0
        while (first < 0 && r < rules.length) {
          if (matchesAt(buf, len, i, rules(r)._1)) first = i
          r += 1
        }
      }
      i += 1
    }
    if (first < 0) return text // nothing defanged: zero-allocation pass-through
    val out = new java.io.ByteArrayOutputStream(len)
    out.write(buf, 0, first)
    i = first
    // batch unmatched bytes into RUNS flushed with one chunked write per
    // rule hit — the per-byte write(int) path is a synchronized monitor
    // op per byte (BAOS), a real tax on long mostly-clean rows
    var runStart = i
    while (i < len) {
      var advanced = false
      val b = buf(i)
      if (b == '[' || b == '(' || b == '{' || b == 'h' || b == 'H') {
        var r = 0
        while (!advanced && r < rules.length) {
          val (pat, rep) = rules(r)
          if (matchesAt(buf, len, i, pat)) {
            if (i > runStart) out.write(buf, runStart, i - runStart)
            out.write(rep)
            i += pat.length
            runStart = i
            advanced = true
          }
          r += 1
        }
      }
      if (!advanced) i += 1
    }
    if (len > runStart) out.write(buf, runStart, len - runStart)
    UTF8String.fromBytes(out.toByteArray)
  }
}
