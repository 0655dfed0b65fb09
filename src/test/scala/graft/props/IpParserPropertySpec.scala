package graft.props

import graft.extract.Ipv6Format
import graft.intel.Cidr
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based grammar tests for the IPv4/IPv6 parsers against
  * independent models (SURVEY.md §5; reference fuzz targets cover the same
  * parsers). The IPv4 model re-implements the strict Rust Ipv4Addr grammar
  * from the spec text (4 octets, 1-3 digits, 0-255, no leading zeros); the
  * IPv6 properties are round-trips through independently-rendered textual
  * forms (full, compressed, v4-mapped).
  */
class IpParserPropertySpec extends AnyFunSuite {

  private def checkProp(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // ---------------------------------------------------------------- IPv4
  /** Independent model of the strict dotted-quad grammar. */
  private def modelParseV4(s: String): Long = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return -1L
    var value = 0L
    for (p <- parts) {
      if (p.isEmpty || p.length > 3) return -1L
      if (!p.forall(c => c >= '0' && c <= '9')) return -1L
      if (p.length > 1 && p.charAt(0) == '0') return -1L
      val v = p.toInt
      if (v > 255) return -1L
      value = (value << 8) | v
    }
    value
  }

  private val octetText: Gen[String] = Gen.frequency(
    5 -> Gen.choose(0, 255).map(_.toString),
    1 -> Gen.choose(0, 999).map(_.toString),
    1 -> Gen.choose(0, 255).map(v => "0" + v), // leading zero
    1 -> Gen.const(""),
    1 -> Gen.oneOf("a", "1a", "-1", "0x1")
  )

  private val quadText: Gen[String] = for {
    n <- Gen.frequency(8 -> Gen.const(4), 1 -> Gen.choose(1, 6))
    parts <- Gen.listOfN(n, octetText)
  } yield parts.mkString(".")

  test("IPv4 parser == independent grammar model (accept + value)") {
    checkProp("ipv4-grammar", Prop.forAllNoShrink(quadText) { s =>
      Cidr.parseV4(s) == modelParseV4(s)
    })
  }

  test("IPv4 valid quads always parse to their value") {
    val valid = Gen.listOfN(4, Gen.choose(0, 255))
    checkProp("ipv4-valid", Prop.forAllNoShrink(valid) { os =>
      val s = os.mkString(".")
      val expected = os.foldLeft(0L)((a, o) => (a << 8) | o)
      Cidr.parseV4(s) == expected
    })
  }

  // ---------------------------------------------------------------- IPv6
  private val groupsGen: Gen[Array[Int]] =
    Gen.listOfN(8, Gen.frequency(
      1 -> Gen.const(0),
      1 -> Gen.choose(0, 0xffff))).map(_.toArray)

  /** Independent full (uncompressed) rendering, random per-group padding
    * and hex case.
    */
  private def renderFull(g: Array[Int], seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    g.map { v =>
      val hex = Integer.toHexString(v)
      val padded = if (rnd.nextBoolean()) ("0" * (4 - hex.length)) + hex else hex
      if (rnd.nextBoolean()) padded.toUpperCase else padded
    }.mkString(":")
  }

  /** Independent compressed rendering: compress ONE randomly chosen run of
    * >=1 zero groups (the grammar allows compressing any single run).
    */
  private def renderCompressed(g: Array[Int], seed: Long): Option[String] = {
    val rnd = new scala.util.Random(seed)
    val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        runs += ((i, j)); i = j
      } else i += 1
    }
    if (runs.isEmpty) return None
    val (s, e) = runs(rnd.nextInt(runs.length))
    val head = g.slice(0, s).map(Integer.toHexString).mkString(":")
    val tail = g.slice(e, 8).map(Integer.toHexString).mkString(":")
    Some(head + "::" + tail)
  }

  test("IPv6 parse round-trips the full uncompressed form") {
    checkProp("ipv6-full-roundtrip",
      Prop.forAllNoShrink(groupsGen, Gen.long) { (g, seed) =>
        val parsed = Ipv6Format.parse(renderFull(g, seed))
        parsed != null && parsed.sameElements(g)
      })
  }

  test("IPv6 parse round-trips any single-run :: compression") {
    checkProp("ipv6-compressed-roundtrip",
      Prop.forAllNoShrink(groupsGen, Gen.long) { (g, seed) =>
        renderCompressed(g, seed) match {
          case None => true
          case Some(s) =>
            val parsed = Ipv6Format.parse(s)
            parsed != null && parsed.sameElements(g)
        }
      })
  }

  test("IPv6 canonical form is stable (parse . format is idempotent)") {
    checkProp("ipv6-canonical-idempotent",
      Prop.forAllNoShrink(groupsGen) { g =>
        val c = Ipv6Format.format(g)
        val reparsed = Ipv6Format.parse(c)
        reparsed != null && reparsed.sameElements(g) &&
          Ipv6Format.canonicalize(c) == c
      })
  }

  test("IPv6 v4-mapped prints mixed notation and round-trips") {
    val v4g = Gen.listOfN(2, Gen.choose(0, 0xffff))
    checkProp("ipv6-v4-mapped", Prop.forAllNoShrink(v4g) { tail =>
      val g = Array(0, 0, 0, 0, 0, 0xffff, tail.head, tail(1))
      val c = Ipv6Format.format(g)
      c.startsWith("::ffff:") && c.contains('.') && {
        val reparsed = Ipv6Format.parse(c)
        reparsed != null && reparsed.sameElements(g)
      }
    })
  }

  test("IPv6 parser rejects malformed mutations") {
    val bad = Gen.oneOf(
      groupsGen.map(g => renderFull(g, 1L) + ":0"), // 9 groups
      groupsGen.map(g => "00000:" + renderFull(g, 2L).split(":", 2)(1)),
      // 8 explicit groups PLUS a "::" — the compression must stand for
      // at least one omitted group
      groupsGen.map(g => renderFull(g, 3L).replaceFirst(":", "::")),
      Gen.const("1::2::3"),
      Gen.const(":::"),
      groupsGen.map(g => renderFull(g, 4L).replace(':', ';')))
    checkProp("ipv6-rejects", Prop.forAllNoShrink(bad) { s =>
      Ipv6Format.parse(s) == null
    })
  }
}
