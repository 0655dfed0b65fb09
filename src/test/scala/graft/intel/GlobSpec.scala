package graft.intel

import org.scalatest.funsuite.AnyFunSuite

/** Glob + paraglob semantics parity
  * (crates/matchy-paraglob/src/glob.rs; tests/integration_tests.rs).
  */
class GlobSpec extends AnyFunSuite {
  private def g(p: String, ci: Boolean = false) =
    Glob.parse(p, ci).toOption.get

  test("star") {
    assert(g("*.example.com").matches("evil.example.com"))
    assert(g("*.example.com").matches(".example.com"))
    assert(!g("*.example.com").matches("example.com"))
    assert(g("error-*").matches("error-42"))
    assert(g("error-*").matches("error-"))
    assert(!g("error-*").matches("xerror-42"))
  }
  test("question") {
    assert(g("mal?.example.com").matches("mal1.example.com"))
    assert(!g("mal?.example.com").matches("mal12.example.com"))
    assert(!g("mal?.example.com").matches("mal.example.com"))
  }
  test("char class") {
    assert(g("mal[0-9].example.com").matches("mal5.example.com"))
    assert(!g("mal[0-9].example.com").matches("malx.example.com"))
    assert(g("x[abc]z").matches("xbz"))
    assert(g("x[!abc]z").matches("xdz"))
    assert(!g("x[!abc]z").matches("xaz"))
    assert(g("x[^abc]z").matches("xdz"))
  }
  test("escapes") {
    assert(g("a\\*b").matches("a*b"))
    assert(!g("a\\*b").matches("aXb"))
  }
  test("pure-wildcard pattern") {
    assert(g("*c2*").matches("my-c2-server"))
    assert(g("*c2*").matches("c2"))
    assert(!g("*c2*").matches("cc"))
  }
  test("pure-literal pattern matches as SUBSTRING (paraglob rule)") {
    // paraglob_offset.rs:1152-1160; integration_tests.rs:134-151
    assert(g("plain-literal").matches("xx plain-literal yy"))
    assert(g("plain-literal").matches("plain-literal"))
    assert(!g("plain-literal").matches("plain-litera"))
    // but anchored-only API does not
    assert(!g("plain-literal").matchesAnchored("xx plain-literal yy"))
  }
  test("case-insensitive mode") {
    assert(g("*.EVIL.com", ci = true).matches("x.evil.COM"))
    assert(g("MAL[a-c]", ci = true).matches("malB"))
    assert(g("lit", ci = true).matches("xxLITyy"))
    // CI ranges keep RAW bounds; the char's ASCII case sibling is tested
    // against them (round-5 fix: folding each bound independently made
    // "[A-_]" the EMPTY range (97,95) and widened "[?-Z]" to (63,122))
    assert(g("[A-_]", ci = true).matchesAnchored("B"))
    assert(g("[A-_]", ci = true).matchesAnchored("b")) // sibling B in range
    assert(g("[A-_]", ci = true).matchesAnchored("_"))
    assert(!g("[A-_]", ci = true).matchesAnchored("{")) // no letter sibling
    assert(!g("[?-Z]", ci = true).matchesAnchored("^")) // 94: widened-bug hit
    assert(g("[?-Z]", ci = true).matchesAnchored("a")) // sibling A in range
    assert(!g("[a-z]", ci = false).matchesAnchored("B")) // CS untouched
    assert(g("[a-z]", ci = true).matchesAnchored("B"))
  }
  test("anchored semantics") {
    assert(!g("evil*").matches("xevil")) // has literal prefilter + anchor
    assert(g("evil*").matches("evilx"))
  }
  test("invalid patterns") {
    assert(Glob.parse("[abc").isLeft) // unclosed
    assert(Glob.parse("[]").isLeft) // empty => unclosed
    assert(Glob.parse("a\\").isLeft) // trailing backslash
    assert(Glob.parse("[z-a]").isLeft) // inverted range
    // the reference's paraglob builder hard-rejects empty patterns
    // (paraglob_offset.rs:63-65); accepting one would yield zero segments
    // and match EVERY string via the pure-literal substring rule
    assert(Glob.parse("").isLeft)
    assert(!Glob.isValid(""))
    // and the forced-glob classification drops the entry, like the
    // reference builder's hard error on invalid forced patterns
    assert(IntelDb.classify("glob:").isEmpty)
    assert(Glob.parse("[]]").isRight) // ']' first = literal ]
    assert(g("[]]").matchesAnchored("]"))
    assert(Glob.parse("[a-]").isRight) // trailing '-' literal
    assert(g("[a-]").matchesAnchored("-"))
  }
  test("backtracking step cap terminates") {
    val p = g("*a*a*a*a*a*a*a*a*a*b")
    assert(!p.matchesAnchored("a" * 300))
    // the cap must not cause FALSE NEGATIVES on deep-but-matching inputs
    // (round-5 test-review find: cap exhaustion reports "no match", so a
    // collapsed cap was indistinguishable from the legitimate failure
    // above — the only cap-exercising assert expected false)
    assert(p.matchesAnchored("a" * 300 + "b"))
  }
  test("unicode chars count as one") {
    assert(g("h?llo").matches("héllo"))
    assert(g("h[é]llo").matches("héllo"))
  }
}
