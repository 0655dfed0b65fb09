package graft.props

import graft.intel.DataValues
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the DataValue typing layer (no Spark session):
  *
  *  1. `renderJson(v, inferTag(v))` always emits VALID JSON (checked with
  *     a strict JSON literal parser) for arbitrary cell strings — the
  *     NDJSON sink can never be poisoned by a weird feed cell;
  *  2. the rendering is VALUE-faithful: numbers round-trip through Java
  *     parsing to the same value the tag's parse grammar produced
  *     (including the reference's i64→Int32 truncation), booleans and
  *     strings verbatim;
  *  3. inference matches a direct Scala model of the reference's cascade
  *     order (i64, u64, f64, bool, string — match_cmd.rs:83-93).
  */
class DataValuesPropertySpec extends AnyFunSuite {

  private def checkProp(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // cell generator biased toward the interesting boundary shapes: numbers
  // around i32/i64/u64 edges, exponent floats, bool-ish words, junk with
  // JSON-hostile characters
  private val numericEdge: Gen[String] = Gen.oneOf(
    "0", "-1", "2147483647", "2147483648", "-2147483648", "-2147483649",
    "9223372036854775807", "9223372036854775808", "6442450944",
    "18446744073709551615", "18446744073709551616", "007", "+42",
    "0.0", "-0.0", "1e3", "1E-3", ".5", "5.", "1.25", "-2.5e10",
    "inf", "-inf", "nan", "NaN", "infinity")
  private val boolish: Gen[String] =
    Gen.oneOf("true", "false", "True", "FALSE", "yes", "no")
  private val junk: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr, Gen.alphaNumStr,
    Gen.listOf(Gen.oneOf('"', '\\', '\n', '\t', '\u0001', 'a', '0', '.'))
      .map(_.mkString))
  private val cellGen: Gen[String] =
    Gen.frequency(4 -> numericEdge, 2 -> boolish, 4 -> junk)

  /** Strict JSON literal validator: number / bool / string per RFC 8259. */
  private def isValidJsonLiteral(s: String): Boolean = {
    val number =
      "-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?".r
    if (s == "true" || s == "false") true
    else if (number.matches(s)) true
    else if (s.length >= 2 && s.head == '"' && s.last == '"') {
      // no unescaped control chars / quotes / backslashes inside
      var i = 1
      var ok = true
      while (i < s.length - 1 && ok) {
        val c = s.charAt(i)
        if (c == '\\') {
          if (i + 1 >= s.length - 1) ok = false
          else {
            val e = s.charAt(i + 1)
            if ("\"\\/bfnrt".indexOf(e) >= 0) i += 1
            else if (e == 'u' && i + 5 < s.length - 1 &&
              s.substring(i + 2, i + 6).forall(ch =>
                Character.digit(ch, 16) >= 0)) i += 5
            else ok = false
          }
        } else if (c == '"' || c < 0x20) ok = false
        i += 1
      }
      ok
    } else false
  }

  // the reference's cascade, modeled directly (Rust-strict grammars)
  private def modelTag(v: String): String = {
    def i64 = "^[+-]?[0-9]+$".r.matches(v) &&
      (try { java.lang.Long.parseLong(v); true }
      catch { case _: NumberFormatException => false })
    def u64 = "^\\+?[0-9]+$".r.matches(v) &&
      (try { java.lang.Long.parseUnsignedLong(v); true }
      catch { case _: NumberFormatException => false })
    def f64 =
      "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$".r.matches(v) &&
        (try {
          java.lang.Double.isFinite(java.lang.Double.parseDouble(v))
        } catch { case _: NumberFormatException => false })
    if (i64) "i32" else if (u64) "u64" else if (f64) "f64"
    else if (v == "true" || v == "false") "bool" else "str"
  }

  test("renderJson(v, inferTag(v)) is always a valid JSON literal") {
    checkProp("valid-json", Prop.forAll(cellGen) { v =>
      isValidJsonLiteral(DataValues.renderJson(v, DataValues.inferTag(v)))
    })
  }

  test("rendering is value-faithful per tag semantics") {
    checkProp("faithful", Prop.forAll(cellGen) { v =>
      val tag = DataValues.inferTag(v)
      val r = DataValues.renderJson(v, tag)
      tag match {
        case "i32" =>
          // the reference's truncating `as i32`
          r == java.lang.Long.parseLong(v).toInt.toString
        case "u64" =>
          r == java.lang.Long.toUnsignedString(
            java.lang.Long.parseUnsignedLong(v))
        case "f64" =>
          java.lang.Double.parseDouble(r) == java.lang.Double.parseDouble(v)
        case "bool" => r == v
        case _ => r == DataValues.escapeJson(v)
      }
    })
  }

  test("inference equals the reference-cascade model") {
    checkProp("cascade", Prop.forAll(cellGen) { v =>
      DataValues.inferTag(v) == modelTag(v)
    })
  }

  test("renderJson degrades mismatched (value, tag) pairs to strings, " +
      "never broken JSON") {
    val tagGen = Gen.oneOf("i32", "u64", "f64", "bool", "str")
    checkProp("mismatch-safe", Prop.forAll(cellGen, tagGen) { (v, t) =>
      isValidJsonLiteral(DataValues.renderJson(v, t))
    })
  }

  test("inference + rendering match hand-pinned reference vectors") {
    // INDEPENDENT fixed expectations, derived by hand from the reference
    // semantics (match_cmd.rs:83-93 cascade, the `as i32` truncation,
    // as_u64 bound, as_f64 fallback, serde_json escaping) — round-5
    // test-review find: the cascade property's model shares the
    // implementation's grammar verbatim, so a mistranscription of the
    // Rust grammars passed both sides; these constants do not.
    val vectors = Seq(
      ("0", "i32", "0"),
      ("42", "i32", "42"),
      ("+7", "i32", "7"), // Rust i64::from_str accepts a leading '+'
      ("-1", "i32", "-1"),
      ("007", "i32", "7"),
      ("2147483648", "i32", "-2147483648"), // i64 in range; `as i32` wraps
      ("6442450944", "i32", "-2147483648"), // the q43 truncation vector
      ("9223372036854775807", "i32", "-1"), // i64::MAX low 32 bits
      ("9223372036854775808", "u64", "9223372036854775808"), // > i64::MAX
      ("18446744073709551615", "u64", "18446744073709551615"), // u64::MAX
      ("18446744073709551616", "f64", "1.8446744073709552E19"), // > u64
      ("3.5", "f64", "3.5"),
      ("-0.25", "f64", "-0.25"),
      ("1e3", "f64", "1000.0"),
      (".5", "f64", "0.5"),
      ("5.", "f64", "5.0"),
      ("true", "bool", "true"),
      ("false", "bool", "false"),
      ("True", "str", "\"True\""), // Rust bool::from_str is case-exact
      ("NaN", "str", "\"NaN\""), // non-finite stays a string (JSON safety)
      ("inf", "str", "\"inf\""),
      ("1e999", "str", "\"1e999\""), // overflows f64 to +inf -> string
      ("0x10", "str", "\"0x10\""), // no hex grammar in from_str
      ("1_000", "str", "\"1_000\""), // no Rust literal separators either
      ("12abc", "str", "\"12abc\""),
      (" 1", "str", "\" 1\""), // from_str takes no whitespace
      ("", "str", "\"\""),
      ("a\"b\\c", "str", "\"a\\\"b\\\\c\""),
      ("tab\there", "str", "\"tab\\there\""),
      ("new\nline", "str", "\"new\\nline\""),
      ("ctrl\u0001x", "str", "\"ctrl\\u0001x\"")
    )
    vectors.foreach { case (cell, tag, json) =>
      assert(DataValues.inferTag(cell) == tag,
        s"tag of '$cell': got ${DataValues.inferTag(cell)}, want $tag")
      assert(DataValues.renderJson(cell, tag) == json,
        s"json of '$cell': got ${DataValues.renderJson(cell, tag)}")
    }
  }
}
