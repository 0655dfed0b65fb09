package graft.intel

import graft.extract.IocScanner

/** Broadcast pre-screen that cheaply rejects clean turns before extraction
  * — the Spark analog of matchy's "AC automaton finds no literal => line is
  * clean" fast path (SURVEY.md §4.3; north-rule trie/bloom pre-screen).
  *
  * This is the zero-allocation byte form: ONE fused pass over the turn's
  * raw UTF-8 bytes drives (a) the IPv4 `digit.digit` anchor, (b) the IPv6
  * `::` anchor (the extractor only emits ::-compressed forms, so the anchor
  * is total), and (c) a byte-level Aho-Corasick automaton over every
  * literal value and every glob literal core, with a dense root row so
  * anchor-free bytes cost one array read. The previous String/token-based
  * form allocated a String per token plus a full lowercased copy of the
  * text per turn — measurably NOT cheap next to the 145 MB/s scanner it was
  * supposed to short-circuit.
  *
  * Soundness (superset filter — may pass clean turns, must NEVER drop a
  * matching one):
  *  - every IP match requires an IPv4/IPv6 candidate, whose textual anchors
  *    (digit.digit / "::") are checked directly on the raw bytes (the
  *    scanner does no de-fanging; the only candidate whose canonical value
  *    differs from its matched span is RFC-5952 IPv6, which still contains
  *    "::" in the source bytes). Which anchors are needed derives from the
  *    unified 128-bit match space, NOT the entries' notation family — see
  *    the derivation note in [[CleanPreScreen.build]];
  *  - every literal match is full-token equality, which implies the literal
  *    occurs as a SUBSTRING of the text — checked by the automaton (a
  *    superset of token equality, so strictly sound). Case-insensitive
  *    databases match on `value.toLowerCase`; the automaton stores the
  *    toLowerCase'd literal and ASCII-folds the text bytes, which agrees
  *    because extracted candidate values are ASCII. A CI literal whose
  *    lowercased form still contains non-ASCII cannot be byte-checked that
  *    way, so it degrades to the any-token fallback instead (never skipped);
  *  - every glob match implies the pattern's longest literal segment is a
  *    substring of the text under Glob's OWN normalization (exact bytes, or
  *    `asciiLower` when CI — Glob.scala:43-50), which the automaton's
  *    ASCII fold reproduces exactly; a glob with no literal core disables
  *    rejection for any turn that has a token (string-path candidates are
  *    always boundary-delimited tokens).
  */
final class CleanPreScreen private (
    // dense state-0 transition row (b -> state; 0 = stay at root)
    root: Array[Int],
    // open-addressing edge table for states >= 1: key = state*256L + byte
    keys: Array[Long],
    vals: Array[Int],
    mask: Int,
    fail: Array[Int],
    // hit(s) = some automaton word ends at state s or on its fail chain
    hit: Array[Boolean],
    hasAc: Boolean,
    anyTokenFallback: Boolean,
    needIpv4: Boolean,
    needIpv6: Boolean,
    foldCase: Boolean
) extends Serializable {

  // per-byte dispatch table over FOLDED bytes: 0 = boring (cannot trigger
  // any check), else a bitmask of which slow checks apply. Boring bytes —
  // the vast majority of clean text — cost one table read and one branch.
  @transient private lazy val classTable: Array[Byte] = {
    val t = new Array[Byte](256)
    if (needIpv4) t('.') = (t('.') | 1).toByte
    if (needIpv6) t(':') = (t(':') | 2).toByte
    if (hasAc) {
      var b = 0
      while (b < 256) {
        if (root(b) != 0) t(b) = (t(b) | 4).toByte
        b += 1
      }
    }
    // CI soundness backstop: Java toLowerCase can map NON-ASCII text
    // characters INTO ASCII (U+212A KELVIN SIGN -> 'k', U+0130 -> 'i'), so
    // under a case-insensitive string section an ASCII-stored literal CAN
    // match a candidate containing non-ASCII bytes via the index's own
    // toLowerCase normalization. The ASCII byte fold cannot see that, so
    // any >= 0x80 byte makes the turn pass outright (class bit 8) — a
    // cheap, sound widening; pure-ASCII text (the norm) is unaffected.
    if (foldCase && hasAc) {
      var b = 128
      while (b < 256) { t(b) = (t(b) | 8).toByte; b += 1 }
    }
    t
  }
  @transient private lazy val foldTable: Array[Int] = {
    val t = new Array[Int](256)
    var b = 0
    while (b < 256) {
      t(b) = if (foldCase && b >= 'A' && b <= 'Z') b + 32 else b
      b += 1
    }
    t
  }

  def mightMatch(bytes: Array[Byte]): Boolean = mightMatch(bytes, bytes.length)

  def mightMatch(bytes: Array[Byte], n: Int): Boolean = {
    if (anyTokenFallback) {
      // a string-path candidate needs a token; any non-boundary byte is one
      var i = 0
      while (i < n) {
        if (!IocScanner.isBoundary(bytes(i))) return true
        i += 1
      }
      // fall through: IP anchors don't need the fallback's token
    }
    val cls = classTable
    val fold = foldTable
    var state = 0
    var i = 0
    while (i < n) {
      val b = fold(bytes(i) & 0xff)
      if (state == 0) {
        val c = cls(b)
        if (c != 0) {
          if ((c & 8) != 0) return true // CI non-ASCII widening (see table)
          if ((c & 1) != 0 && i > 0 && i + 1 < n &&
            IocScanner.isDigit(bytes(i - 1)) && IocScanner.isDigit(bytes(i + 1)))
            return true
          if ((c & 2) != 0 && i + 1 < n && bytes(i + 1) == ':') return true
          if ((c & 4) != 0) {
            state = root(b)
            if (hit(state)) return true
          }
        }
      } else {
        if (b >= 128 && (cls(b) & 8) != 0) return true
        // in-word: '.'/':'-anchored checks still apply (words may contain
        // them), then advance the automaton
        if (b == '.') {
          if (needIpv4 && i > 0 && i + 1 < n && IocScanner.isDigit(bytes(i - 1)) &&
            IocScanner.isDigit(bytes(i + 1))) return true
        } else if (b == ':') {
          if (needIpv6 && i + 1 < n && bytes(i + 1) == ':') return true
        }
        state = step(state, b)
        if (hit(state)) return true
      }
      i += 1
    }
    false
  }

  @inline private def step(s0: Int, b: Int): Int = {
    var s = s0
    while (s != 0) {
      val next = probe(s, b)
      if (next >= 0) return next
      s = fail(s)
    }
    root(b)
  }

  @inline private def probe(s: Int, b: Int): Int = {
    val key = s * 256L + b
    var idx = java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L) & mask
    while (true) {
      val k = keys(idx)
      if (k == key) return vals(idx)
      if (k == -1L) return -1
      idx = (idx + 1) & mask
    }
    -1
  }
}

object CleanPreScreen {

  def build(dbs: Seq[IntelDb]): CleanPreScreen = {
    val words = scala.collection.mutable.LinkedHashSet[Seq[Byte]]()
    var anyToken = false
    dbs.foreach { db =>
      db.entries.foreach { m =>
        m.entryType match {
          case "ip" => // handled below via classified CIDR family
          case "literal" =>
            val key = IntelDb.classify(m.entry) match {
              case Some(IntelDb.LiteralEntry(k)) => k
              case _                             => m.entry
            }
            val norm = if (db.caseInsensitive)
              key.toLowerCase(java.util.Locale.ROOT) else key
            if (norm.nonEmpty) {
              if (db.caseInsensitive && norm.exists(_ >= 128)) anyToken = true
              else words += norm.getBytes("UTF-8").toSeq
            }
          case "glob" =>
            val pat = IntelDb.classify(m.entry) match {
              case Some(IntelDb.GlobEntry(p)) => p
              case _                          => m.entry
            }
            Glob.parse(pat, db.caseInsensitive) match {
              case Right(g) if g.prefilter.nonEmpty =>
                val core = if (db.caseInsensitive) Glob.asciiLower(g.prefilter)
                           else g.prefilter
                words += core.getBytes("UTF-8").toSeq
              case _ => anyToken = true
            }
        }
      }
    }
    // IP anchors derive from the unified 128-bit MATCH space, never the
    // entry's notation family: LpmIndex looks every candidate up
    // family-blind (IPv4 at ::ffff:a.b.c.d), so a db holding only the
    // v6-notation `::/0` still matches IPv4 text, and a v4-notation CIDR
    // (stored at ::ffff:x/96+len) is reachable from IPv6 text like
    // `::ffff:102:304`. Hence: the IPv4 anchor is needed iff ANY CIDR's
    // range intersects the v4-mapped /96; the IPv6 anchor iff ANY CIDR
    // exists at all (every stored range is reachable from some ::-form
    // text). The previous per-family derivation DROPPED matching turns —
    // e.g. `1.2.3.4` against a `::/0`-only db (round-5 review find).
    val cidrs = dbs.flatMap(_.entries.iterator
      .filter(_.entryType == "ip")
      .flatMap(m => IntelDb.classify(m.entry) match {
        case Some(IntelDb.IpEntry(c)) => Some(c)
        case _                        => None
      }))
    val v6Real = cidrs.nonEmpty
    val v4Real = cidrs.exists(Cidr.intersectsV4Mapped)
    val ci = dbs.exists(_.caseInsensitive)
    // with the fold active globally, words from case-SENSITIVE dbs must be
    // stored folded too — that widens their screen to case-insensitive
    // (passes more turns: still a sound superset filter)
    val normWords = words.toArray.map { w =>
      if (ci) w.map(b => if (b >= 'A' && b <= 'Z') (b + 32).toByte else b)
      else w
    }.distinct
    fromWords(normWords.map(_.toArray), anyToken, v4Real, v6Real, ci)
  }

  /** Assemble the automaton: trie -> BFS fail links -> packed tables. */
  private def fromWords(words: Array[Array[Byte]], anyToken: Boolean,
      needIpv4: Boolean, needIpv6: Boolean, ci: Boolean): CleanPreScreen = {
    import scala.collection.mutable.ArrayBuffer
    val edges = ArrayBuffer(new java.util.HashMap[Int, Int]())
    val terminal = ArrayBuffer(false)
    words.foreach { w =>
      var s = 0
      var i = 0
      while (i < w.length) {
        val b = w(i) & 0xff
        val e = edges(s)
        var next = e.getOrDefault(b, -1)
        if (next < 0) {
          next = edges.size
          e.put(b, next)
          edges += new java.util.HashMap[Int, Int]()
          terminal += false
        }
        s = next
        i += 1
      }
      terminal(s) = true
    }
    val n = edges.size
    val fail = new Array[Int](n)
    val hit = new Array[Boolean](n)
    val queue = new java.util.ArrayDeque[Int]()
    val rootEdges = edges(0)
    rootEdges.forEach { (_, s) => fail(s) = 0; queue.add(s) }
    hit(0) = terminal(0)
    while (!queue.isEmpty) {
      val s = queue.poll()
      hit(s) = terminal(s) || hit(fail(s))
      edges(s).forEach { (b, t) =>
        // fail(t): walk s's fail chain for a b-edge
        var f = fail(s)
        var resolved = -1
        while (resolved < 0) {
          val nf = edges(f).getOrDefault(b, -1)
          if (nf >= 0) resolved = nf
          else if (f == 0) resolved = 0
          else f = fail(f)
        }
        fail(t) = resolved
        queue.add(t)
      }
    }
    // pack: dense root row + open-addressing table for deeper states
    val root = new Array[Int](256)
    rootEdges.forEach { (b, s) => root(b) = s }
    var nEdges = 0
    var s = 1
    while (s < n) { nEdges += edges(s).size; s += 1 }
    var cap = 16
    while (cap < nEdges * 2) cap <<= 1
    val keys = Array.fill(cap)(-1L)
    val vals = new Array[Int](cap)
    val mask = cap - 1
    s = 1
    while (s < n) {
      val st = s
      edges(st).forEach { (b, t) =>
        val key = st * 256L + b
        var idx = java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L) & mask
        while (keys(idx) != -1L) idx = (idx + 1) & mask
        keys(idx) = key
        vals(idx) = t
      }
      s += 1
    }
    new CleanPreScreen(root, keys, vals, mask, fail, hit, words.nonEmpty,
      anyToken, needIpv4, needIpv6, ci)
  }
}
