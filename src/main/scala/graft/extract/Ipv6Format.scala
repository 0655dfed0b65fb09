package graft.extract

/** RFC 5952 IPv6 canonical text form, matching Rust's
  * `std::net::Ipv6Addr::to_string()` (the canonical form the reference emits
  * for extracted IPv6, crates/matchy-extractor/src/lib.rs:1044-1116):
  *  - lowercase hex, no leading zeros per group,
  *  - the longest run of >=2 zero groups compressed to "::" (leftmost on
  *    tie),
  *  - IPv4-mapped addresses (::ffff:a.b.c.d) printed in mixed notation.
  */
object Ipv6Format {

  /** Regex-free single-char split keeping trailing empties. */
  private def splitChar(s: String, c: Char): Array[String] = {
    var n = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == c) n += 1; i += 1 }
    val out = new Array[String](n)
    var from = 0
    var k = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == c) { out(k) = s.substring(from, i); k += 1; from = i + 1 }
      i += 1
    }
    out(k) = s.substring(from)
    out
  }

  /** Parse an IPv6 textual form (with optional ::-compression and optional
    * embedded trailing IPv4). Returns the 8 16-bit groups, or null if
    * invalid. Mirrors the grammar accepted by Rust's Ipv6Addr::from_str.
    */
  def parse(s: String): Array[Int] = {
    if (s == null || s.isEmpty) return null
    // split on "::" without java.util.regex (String.split compiles a
    // Pattern per call — measurable in the scan hot path)
    val dc = s.indexOf("::")
    val parts: Array[String] =
      if (dc < 0) Array(s)
      else {
        val tail = s.substring(dc + 2)
        if (tail.contains("::")) return null
        Array(s.substring(0, dc), tail)
      }
    def parseGroups(str: String, allowV4Tail: Boolean): Array[Int] = {
      if (str.isEmpty) return Array.emptyIntArray
      val toks = splitChar(str, ':')
      val out = new scala.collection.mutable.ArrayBuffer[Int](toks.length + 1)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.isEmpty) return null
        if (t.indexOf('.') >= 0) {
          // embedded IPv4: must be the final token
          if (!allowV4Tail || i != toks.length - 1) return null
          val o = parseIpv4Strictish(t)
          if (o == null) return null
          out += ((o(0) << 8) | o(1))
          out += ((o(2) << 8) | o(3))
        } else {
          if (t.length > 4) return null
          var v = 0
          var j = 0
          while (j < t.length) {
            val c = t.charAt(j)
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (c >= 'a' && c <= 'f') c - 'a' + 10
              else if (c >= 'A' && c <= 'F') c - 'A' + 10
              else return null
            v = (v << 4) | d
            j += 1
          }
          out += v
        }
        i += 1
      }
      out.toArray
    }
    if (parts.length == 1) {
      val g = parseGroups(s, allowV4Tail = true)
      if (g == null || g.length != 8) null else g
    } else {
      val head = parseGroups(parts(0), allowV4Tail = false)
      val tail = parseGroups(parts(1), allowV4Tail = true)
      if (head == null || tail == null) return null
      val total = head.length + tail.length
      if (total > 7) return null // "::" must stand for at least one group
      val g = new Array[Int](8)
      System.arraycopy(head, 0, g, 0, head.length)
      System.arraycopy(tail, 0, g, 8 - tail.length, tail.length)
      g
    }
  }

  /** Dotted-quad parser for the embedded-IPv4 tail. Rust's parser here
    * rejects leading zeros and values >255 (same grammar as Ipv4Addr).
    */
  private def parseIpv4Strictish(s: String): Array[Int] = {
    val toks = splitChar(s, '.')
    if (toks.length != 4) return null
    val out = new Array[Int](4)
    var i = 0
    while (i < 4) {
      val t = toks(i)
      if (t.isEmpty || t.length > 3) return null
      if (t.length > 1 && t.charAt(0) == '0') return null
      var v = 0
      var j = 0
      while (j < t.length) {
        val c = t.charAt(j)
        if (c < '0' || c > '9') return null
        v = v * 10 + (c - '0')
        j += 1
      }
      if (v > 255) return null
      out(i) = v
      i += 1
    }
    out
  }

  /** Canonical text form of 8 groups per RFC 5952 / Rust Display. */
  def format(g: Array[Int]): String = {
    // IPv4-mapped: ::ffff:a.b.c.d
    if (g(0) == 0 && g(1) == 0 && g(2) == 0 && g(3) == 0 && g(4) == 0 &&
      g(5) == 0xffff) {
      val a = g(6) >>> 8; val b = g(6) & 0xff
      val c = g(7) >>> 8; val d = g(7) & 0xff
      return s"::ffff:$a.$b.$c.$d"
    }
    // find longest zero run (leftmost wins ties), length >= 2 to compress
    var bestStart = -1
    var bestLen = 0
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { bestLen = j - i; bestStart = i }
        i = j
      } else i += 1
    }
    val sb = new StringBuilder(40)
    if (bestLen >= 2) {
      var k = 0
      while (k < bestStart) {
        if (k > 0) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(k)))
        k += 1
      }
      sb.append("::")
      k = bestStart + bestLen
      var first = true
      while (k < 8) {
        if (!first) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(k)))
        first = false
        k += 1
      }
    } else {
      var k = 0
      while (k < 8) {
        if (k > 0) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(k)))
        k += 1
      }
    }
    sb.toString
  }

  /** Parse + canonicalize; null if not a valid IPv6 literal. */
  def canonicalize(s: String): String = {
    val g = parse(s)
    if (g == null) null else format(g)
  }
}
