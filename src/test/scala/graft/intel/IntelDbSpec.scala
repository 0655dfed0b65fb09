package graft.intel

import graft.model.IntelEntry
import org.scalatest.funsuite.AnyFunSuite

class IntelDbSpec extends AnyFunSuite {

  private def entry(e: String) = IntelEntry(e, "high", "c2", "test", 90)

  // ---- classification (mmdb_builder.rs:392-429 semantics)
  test("classify: auto-detect") {
    import IntelDb._
    assert(classify("1.2.3.4").contains(IpEntry(Cidr.parse("1.2.3.4"))))
    assert(classify("10.0.0.0/8").contains(IpEntry(Cidr.parse("10.0.0.0/8"))))
    assert(classify("2001:db8::/32").contains(
      IpEntry(Cidr.parse("2001:db8::/32"))))
    assert(classify("*.example.com").contains(GlobEntry("*.example.com")))
    assert(classify("evil.com").contains(LiteralEntry("evil.com")))
    // glob-like but invalid glob => literal
    assert(classify("bad[glob").contains(LiteralEntry("bad[glob")))
  }
  test("classify: explicit prefixes") {
    import IntelDb._
    assert(classify("literal:*.not-a-glob.com").contains(
      LiteralEntry("*.not-a-glob.com")))
    assert(classify("glob:no-wildcards.com").contains(
      GlobEntry("no-wildcards.com")))
    assert(classify("ip:1.2.3.4").contains(IpEntry(Cidr.parse("1.2.3.4"))))
    assert(classify("glob:bad[glob").isEmpty) // forced glob must validate
    assert(classify("ip:not-an-ip").isEmpty)
  }
  test("classify: strict IP grammar") {
    import IntelDb._
    assert(classify("1.2.3.04").contains(LiteralEntry("1.2.3.04")))
    assert(classify("1.2.3.4/33").contains(LiteralEntry("1.2.3.4/33")))
    assert(classify("256.1.1.1").contains(LiteralEntry("256.1.1.1")))
  }

  // ---- LPM (tests/test_ip_longest_prefix_match.rs semantics)
  test("LPM: most-specific wins regardless of insert order") {
    val db = IntelDb.build("t", Seq(
      entry("192.0.2.0/24"), entry("192.0.2.1"), entry("192.0.0.0/16")))
    val r1 = db.lookupIp("192.0.2.1", isV6 = false)
    assert(r1 != null && db.entries(r1._1).entry == "192.0.2.1" && r1._2 == 32)
    val r2 = db.lookupIp("192.0.2.77", isV6 = false)
    assert(r2 != null && db.entries(r2._1).entry == "192.0.2.0/24" &&
      r2._2 == 24)
    val r3 = db.lookupIp("192.0.99.1", isV6 = false)
    assert(r3 != null && db.entries(r3._1).entry == "192.0.0.0/16" &&
      r3._2 == 16)
    assert(db.lookupIp("10.0.0.1", isV6 = false) == null)
  }
  test("LPM: exact /32 and ipv6") {
    val db = IntelDb.build("t", Seq(entry("2001:db8::/32"),
      entry("2001:db8::1")))
    val r = db.lookupIp("2001:db8::1", isV6 = true)
    assert(r != null && r._2 == 128)
    val r2 = db.lookupIp("2001:db8:1::2", isV6 = true)
    assert(r2 != null && db.entries(r2._1).entry == "2001:db8::/32" &&
      r2._2 == 32)
    assert(db.lookupIp("2001:db9::1", isV6 = true) == null)
  }
  test("LPM: v4 and v6 coexist; v4 never matches v6-only prefixes") {
    val db = IntelDb.build("t", Seq(entry("2001:db8::/32"),
      entry("1.2.3.0/24")))
    assert(db.lookupIp("1.2.3.9", isV6 = false)._2 == 24)
    assert(db.lookupIp("4.5.6.7", isV6 = false) == null)
  }

  // ---- literal + combined string lookup (database.rs:911-981)
  test("string lookup: literal exact, glob substring-literal, union") {
    val db = IntelDb.build("t", Seq(
      entry("evil.com"), // literal: exact only
      entry("glob:plain-sub"), // forced glob, pure literal => substring
      entry("*.bad.org"), // suffix glob
      entry("*c2*"))) // pure wildcard
    assert(db.lookupString("evil.com").map(i => db.entries(i).entry).toSeq ==
      Seq("evil.com"))
    assert(db.lookupString("x.evil.com").isEmpty) // literal is exact
    val sub = db.lookupString("zz plain-sub zz")
    assert(sub.map(i => db.entries(i).entry).toSeq == Seq("glob:plain-sub"))
    assert(db.lookupString("host.bad.org").map(i => db.entries(i).entry)
      .toSeq == Seq("*.bad.org"))
    assert(db.lookupString("my-c2-box").map(i => db.entries(i).entry).toSeq ==
      Seq("*c2*"))
    // union: literal + matching globs, literal first
    val db2 = IntelDb.build("t", Seq(entry("abc"), entry("a*")))
    val hits = db2.lookupString("abc").map(i => db2.entries(i).entry).toSeq
    assert(hits == Seq("abc", "a*"))
  }
  test("case-insensitive mode lowers literals and globs") {
    val db = IntelDb.build("t", Seq(entry("Evil.COM"), entry("*.Bad.ORG")),
      caseInsensitive = true)
    assert(db.lookupString("EVIL.com").nonEmpty)
    assert(db.lookupString("x.BAD.org").nonEmpty)
  }
  test("glob ids sorted and deduped") {
    val db = IntelDb.build("t", Seq(entry("*b*"), entry("*a*")))
    val hits = db.lookupString("ab")
    assert(hits.toSeq == hits.sorted.toSeq && hits.length == 2)
    // dedup through the MULTI-word prefilter path (round-5 test-review
    // find: a single-meta-word pattern cannot produce duplicates even
    // with the seenP generation stamp deleted): '*xx*yy*' is reachable
    // via BOTH its literal words, so without dedup its id appears twice
    val db2 = IntelDb.build("t", Seq(entry("*xx*yy*"), entry("*xx*")))
    val h2 = db2.lookupString("axxbyyc")
    assert(h2.toSeq == h2.sorted.toSeq && h2.length == 2, h2.mkString(","))
  }
  test("L7 lookup memo: repeat and flooded lookups stay correct") {
    val db = IntelDb.build("t", Seq(entry("evil.com"), entry("*.bad.org"),
      entry("192.0.2.0/24"), entry("192.0.2.1")))
    // repeated lookups (memo hits) return the same results as the first
    val first = db.lookupString("evil.com").toSeq
    assert(first.nonEmpty)
    (1 to 3).foreach(_ => assert(db.lookupString("evil.com").toSeq == first))
    // bind + non-null FIRST (round-5 test-review find: x == x was
    // null == null if the /32 hit regressed to a miss): most-specific
    // wins, so the /32 beats the /24
    val ip1 = db.lookupIp("192.0.2.1", isV6 = false)
    assert(ip1 != null && ip1._2 == 32, String.valueOf(ip1))
    assert(db.lookupIp("192.0.2.1", isV6 = false) == ip1)
    assert(db.lookupIp("203.0.113.9", isV6 = false) == null)
    assert(db.lookupIp("203.0.113.9", isV6 = false) == null) // cached miss
    // flood 9000 distinct misses through the direct-mapped memo (blind
    // slot overwrites), then verify the hot keys still resolve
    (0 until 9000).foreach(i => db.lookupString(s"miss$i.example.com"))
    assert(db.lookupString("evil.com").toSeq == first)
    assert(db.lookupString("x.bad.org").nonEmpty)
    assert(db.lookupIp("192.0.2.77", isV6 = false) != null) // /24, first look
    // REAL eviction/refill (round-5 test-review find: the blind flood
    // provably never landed on the hot keys' slots, so slot replacement
    // was untested): construct a missing key that SHARES evil.com's slot
    // and alternate — each lookup evicts the other and must re-resolve;
    // a stale-value-on-replace bug returns wrong ids here
    val collide = Iterator.from(0).map(i => s"c$i.example.net")
      .find(k => IntelDb.memoSlot(k) == IntelDb.memoSlot("evil.com")).get
    (0 until 4).foreach { _ =>
      assert(db.lookupString(collide).isEmpty)
      assert(db.lookupString("evil.com").toSeq == first)
    }
    // same for the ip memo: a missing v4 sharing the /32 hit's slot
    val ipCollide = Iterator.from(0)
      .map(i => s"203.${i / 62500 % 250}.${i / 250 % 250}.${i % 250}")
      .find(k => IntelDb.memoSlot(k) == IntelDb.memoSlot("192.0.2.1")).get
    (0 until 4).foreach { _ =>
      assert(db.lookupIp(ipCollide, isV6 = false) == null, ipCollide)
      assert(db.lookupIp("192.0.2.1", isV6 = false) == ip1)
    }
  }
  test("L7 ip memo: wrong-family probe cannot poison the right family") {
    val db = IntelDb.build("t", Seq(entry("192.0.2.0/24")))
    // a v6-dispatched probe of a v4 string misses...
    assert(db.lookupIp("192.0.2.9", isV6 = true) == null)
    // ...and must NOT turn the correct v4 lookup into a cached miss
    assert(db.lookupIp("192.0.2.9", isV6 = false) != null)
  }
}
