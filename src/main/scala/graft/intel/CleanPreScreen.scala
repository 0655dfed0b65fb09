package graft.intel

import graft.extract.IocScanner

/** Broadcast pre-screen that cheaply rejects clean turns before extraction
  * — the Spark analog of matchy's "AC automaton finds no literal => line is
  * clean" fast path (SURVEY.md §4.3; north-rule trie/bloom pre-screen).
  *
  * Soundness (superset filter — may pass clean turns, must NEVER drop a
  * matching one):
  *  - every string-path match is on an extracted value that is exactly one
  *    boundary-delimited token of the text (all extractors enforce word
  *    boundaries), so literal entries are checked by token-set membership;
  *  - every glob match implies each of the pattern's literal segments is a
  *    substring of the text, so glob entries are checked by their longest
  *    literal core via contains(); a glob with no literal core (pure
  *    wildcard) disables rejection for any turn that has tokens;
  *  - every IP match requires an IPv4/IPv6 candidate, whose textual anchors
  *    (digit.digit / "::") are checked directly.
  */
final class CleanPreScreen(
    literalTokens: java.util.HashSet[String],
    globCores: Array[String],
    anyTokenFallback: Boolean,
    needIpv4: Boolean,
    needIpv6: Boolean,
    caseInsensitive: Boolean
) extends Serializable {

  def mightMatch(bytes: Array[Byte]): Boolean = mightMatch(bytes, bytes.length)

  def mightMatch(bytes: Array[Byte], n: Int): Boolean = {
    // IP anchors
    if (needIpv4) {
      var i = 1
      while (i + 1 < n) {
        if (bytes(i) == '.' && IocScanner.isDigit(bytes(i - 1)) &&
          IocScanner.isDigit(bytes(i + 1))) return true
        i += 1
      }
    }
    if (needIpv6) {
      var i = 0
      while (i + 1 < n) {
        if (bytes(i) == ':' && bytes(i + 1) == ':') return true
        i += 1
      }
    }
    // token membership against literal values
    val hasStringWork = !literalTokens.isEmpty || globCores.nonEmpty ||
      anyTokenFallback
    if (hasStringWork) {
      val spans = IocScanner.tokenSpansInto(bytes, n,
        new IocScanner.IntVec(16))
      if (anyTokenFallback && spans.length > 0) return true
      if (!literalTokens.isEmpty) {
        var t = 0
        while (t + 1 < spans.length) {
          val s = spans(t)
          val e = spans(t + 1)
          var tok = new String(bytes, s, e - s, "UTF-8")
          if (caseInsensitive) tok = tok.toLowerCase
          if (literalTokens.contains(tok)) return true
          t += 2
        }
      }
      if (globCores.nonEmpty) {
        var text = new String(bytes, 0, n, "UTF-8")
        if (caseInsensitive) text = text.toLowerCase
        var g = 0
        while (g < globCores.length) {
          if (text.contains(globCores(g))) return true
          g += 1
        }
      }
    }
    false
  }
}

object CleanPreScreen {
  def build(dbs: Seq[IntelDb]): CleanPreScreen = {
    val lits = new java.util.HashSet[String]()
    val cores = scala.collection.mutable.ArrayBuffer[String]()
    var anyToken = false
    val ci = dbs.exists(_.caseInsensitive)
    dbs.foreach { db =>
      db.entries.foreach { m =>
        m.entryType match {
          case "ip" => // handled below via classified CIDR family
          case "literal" =>
            val key = IntelDb.classify(m.entry) match {
              case Some(IntelDb.LiteralEntry(k)) => k
              case _                             => m.entry
            }
            lits.add(if (db.caseInsensitive) key.toLowerCase else key)
          case "glob" =>
            val pat = IntelDb.classify(m.entry) match {
              case Some(IntelDb.GlobEntry(p)) => p
              case _                          => m.entry
            }
            Glob.parse(pat, db.caseInsensitive) match {
              case Right(g) if g.prefilter.nonEmpty =>
                cores += (if (db.caseInsensitive) g.prefilter.toLowerCase
                          else g.prefilter)
              case _ => anyToken = true
            }
        }
      }
    }
    val v6Real = dbs.exists(_.entries.exists(m => m.entryType == "ip" &&
      (IntelDb.classify(m.entry) match {
        case Some(IntelDb.IpEntry(c)) => !c.isV4
        case _                        => false
      })))
    val v4Real = dbs.exists(_.entries.exists(m => m.entryType == "ip" &&
      (IntelDb.classify(m.entry) match {
        case Some(IntelDb.IpEntry(c)) => c.isV4
        case _                        => false
      })))
    new CleanPreScreen(lits, cores.distinct.toArray, anyToken, v4Real,
      v6Real, ci)
  }
}
