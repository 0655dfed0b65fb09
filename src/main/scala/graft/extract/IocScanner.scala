package graft.extract

import graft.model.{IndicatorType => T, Ioc}

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Scanner configuration (reference ExtractorBuilder defaults,
  * crates/matchy-extractor/src/lib.rs:35-50).
  */
final case class ScanConfig(
    domains: Boolean = true,
    emails: Boolean = true,
    ipv4: Boolean = true,
    ipv6: Boolean = true,
    hashes: Boolean = true,
    bitcoin: Boolean = true,
    ethereum: Boolean = true,
    monero: Boolean = true,
    minDomainLabels: Int = 2,
    requireWordBoundaries: Boolean = true
)

object ScanConfig {
  /** Capability-derived defaults of the match flow (match_cmd.rs:277-303):
    * a db with ip data enables the ip extractors, string data (literals or
    * globs) the rest — a string-only feed never pays the IPv4/IPv6 scan on
    * every turn, and vice versa.
    */
  def forCapabilities(hasIp: Boolean, hasStrings: Boolean): ScanConfig =
    ScanConfig(
      domains = hasStrings, emails = hasStrings,
      ipv4 = hasIp, ipv6 = hasIp,
      hashes = hasStrings, bitcoin = hasStrings,
      ethereum = hasStrings, monero = hasStrings)
}

/** Single-pass IoC scanner over the UTF-8 bytes of one turn's text.
  *
  * Re-implements the observable extraction semantics of the reference
  * extractor (crates/matchy-extractor/src/lib.rs) from scratch in Scala:
  * boundary alphabet (lib.rs:1568-1593), per-type candidate grammars
  * (SURVEY.md §2.2 E1-E8), emission order of line-mode extraction
  * (lib.rs:1471-1521): domains, ipv4, emails, ipv6, hashes, bitcoin,
  * ethereum, monero. Spans are byte offsets; candidates are not deduped and
  * may overlap across types (an email also yields its domain).
  *
  * This class is immutable and serializable — one instance is shared by all
  * executor threads (it backs the `extract_iocs` Catalyst expression).
  */
final class IocScanner(val config: ScanConfig) extends Serializable {
  import IocScanner._

  def scanText(text: String): ArrayBuffer[Ioc] =
    scan(text.getBytes(StandardCharsets.UTF_8))

  def scan(bytes: Array[Byte]): ArrayBuffer[Ioc] =
    scan(bytes, bytes.length)

  def scan(bytes: Array[Byte], len: Int): ArrayBuffer[Ioc] =
    scanInto(bytes, len, new ArrayBuffer[Ioc](4))

  /** Scan bytes[0, len) into `out` (cleared first). The length parameter +
    * caller-owned buffer let the Catalyst expressions reuse thread-local
    * scratch instead of allocating a byte[] + ArrayBuffer per row — at 32
    * scan threads that per-row garbage was the GC wall (round-2 scaling).
    */
  def scanInto(bytes: Array[Byte], n: Int,
      out: ArrayBuffer[Ioc]): ArrayBuffer[Ioc] =
    scanInto(bytes, n, out, scratch.get())

  /** Caller-supplied-scratch variant: lets the expression layer reuse the
    * ScanScratch it hangs off its own per-row scratch holder, so a scan
    * costs ONE ThreadLocal probe total (every extra ThreadLocal is a hash
    * probe in a collision-prone per-thread map — JFR: getEntryAfterMiss).
    */
  def scanInto(bytes: Array[Byte], n: Int, out: ArrayBuffer[Ioc],
      scr: IocScanner.ScanScratch): ArrayBuffer[Ioc] = {
    out.clear()
    // ONE fused anchor pass over the bytes (the reference's shared
    // precompute, lib.rs:412-447): token boundaries + '.', '@', "::", "0x"
    // anchor positions collected together — the per-type scans previously
    // each swept the full byte range again (6 passes; fused is the single
    // biggest scanner win in the JFR profile).
    collectAnchors(bytes, n, scr)
    if (config.domains) scanDomains(bytes, n, scr.dots, out)
    if (config.ipv4) scanIpv4(bytes, n, scr.dots, out)
    if (config.emails) scanEmails(bytes, n, scr.ats, out)
    if (config.ipv6) scanIpv6(bytes, n, scr.dcolons, out)
    if (config.hashes) scanHashes(bytes, scr.tokens, out)
    if (config.bitcoin) scanBitcoin(bytes, scr.tokens, out)
    if (config.ethereum) scanEthereum(bytes, n, scr.zx, out)
    if (config.monero) scanMonero(bytes, scr.tokens, out)
    out
  }

  /** The fused anchor pass: token spans of maximal non-boundary runs
    * (reference find_word_boundaries_into, lib.rs:1742-1782), RESTRICTED
    * to spans >= 26 bytes (the fixed-width consumers' floor — see the
    * comment in the body), dot/at positions, "::" pair starts (all,
    * including overlapping — the consumer applies the non-overlap skip),
    * and "0x" starts (overlap impossible: b(i+1)=='x' excludes a '0').
    */
  private def collectAnchors(b: Array[Byte], n: Int,
      scr: IocScanner.ScanScratch): Unit = {
    val tokens = scr.tokens; tokens.clear()
    val dots = scr.dots; dots.clear()
    val ats = scr.ats; ats.clear()
    val dcolons = scr.dcolons; dcolons.clear()
    val zx = scr.zx; zx.clear()
    // one combined class-table read per byte (anchorClassTable); the
    // common class-0 byte (non-boundary, non-anchor — most of any text)
    // costs a single well-predicted branch. Semantics identical to the
    // per-char compare chain this replaces (the anchor chars '.': '@' '0'
    // are mutually exclusive, and the boundary bit mirrors isBoundary).
    val tbl = IocScanner.anchorClassTable
    // token spans feed ONLY the fixed-width scanners (hashes >= 32,
    // bitcoin >= 26, monero >= 90 bytes): spans shorter than 26 can never
    // produce a candidate, and most tokens in real text are short words —
    // filtering here keeps the span vector (and the three consumers'
    // iteration) proportional to rare long tokens instead of every word.
    // NOTE (round 6): a tight-run restructure of this loop (inner
    // `while (tbl(b(i)) == 0)` skip) was tried and measured SLOWER in an
    // interleaved same-JVM A/B (430 vs 561 MB/s anchors-only median of
    // 5) — the single flat loop JIT-compiles better. Keep it flat.
    var tokenStart = -1
    var i = 0
    while (i < n) {
      val k = tbl(b(i) & 0xff)
      if (k == 0) {
        if (tokenStart < 0) tokenStart = i
      } else {
        if ((k & 1) != 0) {
          if (tokenStart >= 0) {
            if (i - tokenStart >= 26) { tokens.add(tokenStart); tokens.add(i) }
            tokenStart = -1
          }
        } else if (tokenStart < 0) tokenStart = i
        if ((k & 2) != 0) dots.add(i)
        else if ((k & 4) != 0) ats.add(i)
        else if ((k & 8) != 0) { if (i + 1 < n && b(i + 1) == ':') dcolons.add(i) }
        else if ((k & 16) != 0) { if (i + 1 < n && b(i + 1) == 'x') zx.add(i) }
      }
      i += 1
    }
    if (tokenStart >= 0 && n - tokenStart >= 26) {
      tokens.add(tokenStart); tokens.add(n)
    }
  }

  // ------------------------------------------------------------- domains
  private def scanDomains(b: Array[Byte], n: Int, dots: IntVec,
      out: ArrayBuffer[Ioc]): Unit = {
    var lastSpanEnd = 0
    var di = 0
    while (di < dots.length) {
      val dot = dots(di)
      if (dot >= lastSpanEnd) {
        var start = dot
        while (start > 0 && isDomainChar(b(start - 1))) start -= 1
        var end = dot + 1
        while (end < n && isDomainChar(b(end))) end += 1
        if (start < dot && end > dot + 1) {
          val tldStart = Psl.tldSuffixPos(b, start, end)
          if (tldStart > 0) { // -1 = no TLD; 0 = bare TLD, rejected
            val boundaryOk = !config.requireWordBoundaries ||
              ((start == 0 || isBoundary(b(start - 1))) &&
                (end == n || isBoundary(b(end))))
            if (boundaryOk && validLabels(b, start, end) &&
              utf8Valid(b, start, end)) {
              val s = new String(b, start, end - start, StandardCharsets.UTF_8)
              out += Ioc(T.Domain, s, s, start, end)
            }
          }
        }
        // skip the span's remaining dots on REJECTION too (round 6):
        // domain-char runs are maximal, so every dot inside [start, end)
        // derives exactly this span and reaches the same verdict — the
        // old accept-only skip made a dotted-quad pay the PSL walk once
        // PER DOT. Emission is unchanged: an accepted span emits at its
        // first dot (as before), a rejected span emits nothing either way.
        lastSpanEnd = end
      }
      di += 1
    }
  }

  /** Labels: non-empty, no leading/trailing hyphen, count >= min. */
  private def validLabels(b: Array[Byte], start: Int, end: Int): Boolean = {
    var count = 0
    var labelStart = start
    var i = start
    while (i <= end) {
      if (i == end || b(i) == '.') {
        val len = i - labelStart
        if (len == 0) return false
        if (b(labelStart) == '-' || b(i - 1) == '-') return false
        count += 1
        labelStart = i + 1
      }
      i += 1
    }
    count >= config.minDomainLabels
  }

  // --------------------------------------------------------------- ipv4
  private def scanIpv4(b: Array[Byte], n: Int, dots: IntVec,
      out: ArrayBuffer[Ioc]): Unit = {
    // dot positions come from the fused anchor pass
    var lastEnd = 0
    // every dot of one digit/dot run walks back to the SAME start, and
    // tryParseIpv4 parses from that start only — a failed start fails
    // identically for the run's other dots, so remember it (round 6;
    // "999.1.2.3" paid the parse once per dot before)
    var lastFailedStart = -1
    var di = 0
    while (di < dots.length) {
      val dotPos = dots(di)
      if (dotPos != 0 && dotPos + 6 <= n &&
        isDigit(b(dotPos - 1)) && isDigit(b(dotPos + 1))) {
        var start = dotPos
        while (start > 0 && (isDigit(b(start - 1)) || b(start - 1) == '.'))
          start -= 1
        if (start >= lastEnd && start != lastFailedStart) {
          // need >=3 dots within [this dot, start+15)
          val endSearch = math.min(start + 15, n)
          var cnt = 0
          var dj = di
          while (dj < dots.length && dots(dj) < endSearch) { cnt += 1; dj += 1 }
          if (cnt >= 3) {
            val parsed = tryParseIpv4(b, n, start)
            if (parsed != null) {
              val end = parsed._2
              val s = parsed._1
              out += Ioc(T.Ipv4, s,
                new String(b, start, end - start, StandardCharsets.UTF_8),
                start, end)
              lastEnd = end
            } else lastFailedStart = start
          }
        }
      }
      di += 1
    }
  }

  /** Strict dotted-quad parse from `start`: 4 octets of 1-3 digits, each
    * 0-255, no leading zeros, word boundaries both ends. Returns
    * (canonical, end) or null.
    */
  private def tryParseIpv4(b: Array[Byte], n: Int, start: Int): (String, Int) = {
    if (config.requireWordBoundaries && start > 0 && !isBoundary(b(start - 1)))
      return null
    var pos = start
    val octets = new Array[Int](4)
    var oi = 0
    while (oi < 4) {
      var value = 0
      var digits = 0
      val octetStart = pos
      while (pos < n && isDigit(b(pos)) && digits < 3) {
        value = value * 10 + (b(pos) - '0')
        pos += 1
        digits += 1
      }
      if (digits == 0) return null
      if (value > 255) return null
      if (digits > 1 && b(octetStart) == '0') return null
      octets(oi) = value
      if (oi < 3) {
        if (pos >= n || b(pos) != '.') return null
        pos += 1
      }
      oi += 1
    }
    if (config.requireWordBoundaries && pos < n && !isBoundary(b(pos)))
      return null
    (s"${octets(0)}.${octets(1)}.${octets(2)}.${octets(3)}", pos)
  }

  // -------------------------------------------------------------- emails
  private def scanEmails(b: Array[Byte], n: Int, ats: IntVec,
      out: ArrayBuffer[Ioc]): Unit = {
    var ai = 0
    while (ai < ats.length) {
      val at = ats(ai)
      locally {
        var start = at
        while (start > 0 && isEmailLocalChar(b(start - 1))) start -= 1
        var ok = start < at
        if (ok && config.requireWordBoundaries && start > 0 &&
          !isBoundary(b(start - 1))) ok = false
        if (ok) {
          var end = at + 1
          while (end < n && isDomainChar(b(end))) end += 1
          if (end > at + 1) {
            if (!config.requireWordBoundaries || end == n || isBoundary(b(end))) {
              // local part: no "..", at least one ASCII letter
              var hasLetter = false
              var dd = false
              var i = start
              while (i < at) {
                val c = b(i)
                if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
                  hasLetter = true
                if (c == '.' && i + 1 < at && b(i + 1) == '.') dd = true
                i += 1
              }
              if (hasLetter && !dd) {
                // domain part: at least one dot + PSL TLD
                var hasDot = false
                i = at + 1
                while (i < end && !hasDot) { if (b(i) == '.') hasDot = true; i += 1 }
                if (hasDot && Psl.tldSuffixPos(b, at + 1, end) >= 0 &&
                  utf8Valid(b, start, end)) {
                  val s =
                    new String(b, start, end - start, StandardCharsets.UTF_8)
                  out += Ioc(T.Email, s, s, start, end)
                }
              }
            }
          }
        }
      }
      ai += 1
    }
  }

  // --------------------------------------------------------------- ipv6
  private def scanIpv6(b: Array[Byte], n: Int, dcolons: IntVec,
      out: ArrayBuffer[Ioc]): Unit = {
    var lastEnd = 0
    var search = 0
    var ci = 0
    while (ci < dcolons.length) {
      // next non-overlapping "::" (the fused pass collects ALL pair starts)
      val dc = dcolons(ci)
      ci += 1
      if (dc >= search) {
      search = dc + 2
      if (dc >= lastEnd) {
        val hexBefore = dc > 0 && isHex(b(dc - 1))
        val hexAfter = dc + 2 < n && isHex(b(dc + 2))
        if (hexBefore || hexAfter) {
          var start = dc
          while (start > 0 && (isHex(b(start - 1)) || b(start - 1) == ':'))
            start -= 1
          var end = dc + 2
          while (end < n && (isHex(b(end)) || b(end) == ':')) end += 1
          val len = end - start
          if (len < 8) { lastEnd = end }
          else if (b(start) == ':' && b(start + 1) == ':') { lastEnd = end }
          else if (b(end - 1) == ':' && b(end - 2) == ':') { lastEnd = end }
          else if (isLoopbackOrLinkLocal(b, start, end)) { lastEnd = end }
          else {
            val raw = new String(b, start, len, StandardCharsets.US_ASCII)
            val canonical = Ipv6Format.canonicalize(raw)
            if (canonical != null) {
              out += Ioc(T.Ipv6, canonical, raw, start, end)
              lastEnd = end
            } else lastEnd = dc + 2
          }
        } else lastEnd = dc + 2
      }
      }
    }
  }

  /** Reject ::1 and fe80::/10 by textual prefix (lib.rs:1425-1456). */
  private def isLoopbackOrLinkLocal(b: Array[Byte], start: Int, end: Int): Boolean = {
    val len = end - start
    if (len == 3 && b(start) == ':' && b(start + 1) == ':' && b(start + 2) == '1')
      return true
    if (len >= 3) {
      val c0 = lower(b(start)); val c1 = lower(b(start + 1)); val c2 = lower(b(start + 2))
      if (c0 == 'f' && c1 == 'e' && (c2 == '8' || c2 == '9' || c2 == 'a' || c2 == 'b'))
        return true
    }
    false
  }

  // -------------------------------------------------------------- hashes
  private def scanHashes(b: Array[Byte], tokens: IntVec,
      out: ArrayBuffer[Ioc]): Unit = {
    var t = 0
    while (t + 1 < tokens.length) {
      val start = tokens(t)
      val end = tokens(t + 1)
      val len = end - start
      val tpe = len match {
        case 32  => T.Md5
        case 40  => T.Sha1
        case 64  => T.Sha256
        case 96  => T.Sha384
        case 128 => T.Sha512
        case _   => null
      }
      if (tpe != null && allHex(b, start, end)) {
        val s = new String(b, start, len, StandardCharsets.US_ASCII)
        out += Ioc(tpe, s, s, start, end)
      }
      t += 2
    }
  }

  // ------------------------------------------------------------- bitcoin
  private def scanBitcoin(b: Array[Byte], tokens: IntVec,
      out: ArrayBuffer[Ioc]): Unit = {
    var t = 0
    while (t + 1 < tokens.length) {
      val start = tokens(t)
      val end = tokens(t + 1)
      val len = end - start
      if (len >= 26 && len <= 62) {
        if (len >= 3 && b(start) == 'b' && b(start + 1) == 'c' &&
          b(start + 2) == '1') {
          if (asciiOnly(b, start, end)) {
            val s = new String(b, start, len, StandardCharsets.US_ASCII)
            if (Checksums.validBitcoinBech32(s))
              out += Ioc(T.Bitcoin, s, s, start, end)
          }
        } else if (b(start) == '1' || b(start) == '3') {
          if (asciiOnly(b, start, end)) {
            val s = new String(b, start, len, StandardCharsets.US_ASCII)
            if (Checksums.validBase58Check(s))
              out += Ioc(T.Bitcoin, s, s, start, end)
          }
        }
      }
      t += 2
    }
  }

  // ------------------------------------------------------------ ethereum
  private def scanEthereum(b: Array[Byte], n: Int, zx: IntVec,
      out: ArrayBuffer[Ioc]): Unit = {
    // "0x" starts from the fused pass; pairs cannot overlap
    var zi = 0
    while (zi < zx.length) {
      val start = zx(zi)
      if (start + 42 <= n &&
        (!config.requireWordBoundaries || start == 0 || isBoundary(b(start - 1)))) {
        val end = start + 42
        if ((!config.requireWordBoundaries || end == n || isBoundary(b(end))) &&
          allHex(b, start + 2, end) &&
          // validate on the raw bytes (zero-alloc EIP-55, round 6); the
          // String is built only for the accepted address
          Checksums.validEthereumBytes(b, start)) {
          val s = new String(b, start, 42, StandardCharsets.US_ASCII)
          out += Ioc(T.Ethereum, s, s, start, end)
        }
      }
      zi += 1
    }
  }

  // -------------------------------------------------------------- monero
  private def scanMonero(b: Array[Byte], tokens: IntVec,
      out: ArrayBuffer[Ioc]): Unit = {
    var t = 0
    while (t + 1 < tokens.length) {
      val start = tokens(t)
      val end = tokens(t + 1)
      val len = end - start
      if (len >= 90 && len <= 110 && (b(start) == '4' || b(start) == '8') &&
        asciiOnly(b, start, end)) {
        val s = new String(b, start, len, StandardCharsets.US_ASCII)
        if (Checksums.validMonero(s))
          out += Ioc(T.Monero, s, s, start, end)
      }
      t += 2
    }
  }
}

object IocScanner {
  val default = new IocScanner(ScanConfig())

  /** Boundary alphabet (reference BOUNDARY_LOOKUP, lib.rs:1568-1593):
    * whitespace + / , ; : ( ) [ ] { } < > " ' @ =
    */
  private val boundaryTable: Array[Boolean] = {
    val t = new Array[Boolean](256)
    " \t\n\r/,;:()[]{}<>\"'@=".foreach(c => t(c.toInt) = true)
    t
  }

  /** Domain chars: [A-Za-z0-9.-] plus bytes >= 0x80 (IDN), lib.rs:1597-1629. */
  private val domainCharTable: Array[Boolean] = {
    val t = new Array[Boolean](256)
    var i = '0'.toInt; while (i <= '9') { t(i) = true; i += 1 }
    i = 'a'.toInt; while (i <= 'z') { t(i) = true; i += 1 }
    i = 'A'.toInt; while (i <= 'Z') { t(i) = true; i += 1 }
    t('-'.toInt) = true
    t('.'.toInt) = true
    i = 0x80; while (i <= 0xff) { t(i) = true; i += 1 }
    t
  }

  /** Per-thread scanner scratch, consolidated behind ONE ThreadLocal. */
  final class ScanScratch {
    val tokens = new IntVec(64)
    val dots = new IntVec(16)
    val ats = new IntVec(8)
    val dcolons = new IntVec(8)
    val zx = new IntVec(8)
  }
  private val scratch = new ThreadLocal[ScanScratch] {
    override def initialValue(): ScanScratch = new ScanScratch
  }

  /** Fused anchor-pass byte classes: bit0 boundary, bit1 '.', bit2 '@',
    * bit3 ':', bit4 '0'. Class 0 = plain token byte (the fast path).
    */
  private[extract] val anchorClassTable: Array[Byte] = {
    val t = new Array[Byte](256)
    var i = 0
    while (i < 256) { if (boundaryTable(i)) t(i) = 1; i += 1 }
    t('.') = (t('.') | 2).toByte
    t('@') = (t('@') | 4).toByte
    t(':') = (t(':') | 8).toByte
    t('0') = (t('0') | 16).toByte
    t
  }

  @inline def isBoundary(b: Byte): Boolean = boundaryTable(b & 0xff)
  @inline def isDomainChar(b: Byte): Boolean = domainCharTable(b & 0xff)
  @inline def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline def isHex(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')
  @inline def isEmailLocalChar(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') ||
      (b >= 'A' && b <= 'Z') || b == '.' || b == '-' || b == '_' || b == '+'
  @inline private def lower(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b.toInt

  def allHex(b: Array[Byte], from: Int, to: Int): Boolean = {
    var i = from
    while (i < to) { if (!isHex(b(i))) return false; i += 1 }
    true
  }

  def asciiOnly(b: Array[Byte], from: Int, to: Int): Boolean = {
    var i = from
    while (i < to) { if (b(i) < 0) return false; i += 1 }
    true
  }

  /** Unboxed growable int vector — the scan hot path must not box ints
    * (ArrayBuffer[Int] boxes; the resulting GC pressure halves throughput).
    */
  final class IntVec(initial: Int) {
    private var arr = new Array[Int](initial)
    var length: Int = 0
    def clear(): Unit = length = 0
    def add(v: Int): Unit = {
      if (length == arr.length) {
        val next = new Array[Int](arr.length * 2)
        System.arraycopy(arr, 0, next, 0, arr.length)
        arr = next
      }
      arr(length) = v
      length += 1
    }
    def apply(i: Int): Int = arr(i)
  }

  /** Strict UTF-8 validity of bytes[from, to). */
  def utf8Valid(b: Array[Byte], from: Int, to: Int): Boolean = {
    var i = from
    while (i < to) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) {
        if (i + 1 >= to || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) {
        if (i + 2 >= to || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80) return false
        val cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        if (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += 3
      } else if (c < 0xf5) {
        if (i + 3 >= to || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        if (cp < 0x10000 || cp > 0x10ffff) return false
        i += 4
      } else return false
    }
    true
  }
}
