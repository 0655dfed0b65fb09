package graft.extract

import java.nio.charset.StandardCharsets

/** Public-suffix snapshot used for domain/email TLD validation.
  *
  * Mirrors the reference's compile-time-embedded PSL behavior
  * (crates/matchy-extractor/src/lib.rs:1546-1563, 1671-1692): suffixes are
  * compared byte-exact (so only lowercase TLDs validate), the suffix walk
  * goes right-to-left over dots and accepts the first PSL hit, and the
  * entry file format skips blank lines and `//` comments.
  *
  * The snapshot at `graft/psl_snapshot.dat` is the reference's full PSL
  * file vendored byte-for-byte (10,496 lines, Mozilla Public Suffix List,
  * MPL-2.0, crates/matchy-extractor/src/data/public_suffix_list.dat) —
  * md5 6aa29e437a9e742d1bbca03f66bc7910. Wildcard lines (`*.foo`) are
  * stored as literal strings exactly like the reference does, which makes
  * them inert for matching (no real label equals "*") — intentional parity,
  * not an oversight.
  */
object Psl {

  /** Suffixes as ISO-8859-1-decoded strings: one char per byte, so string
    * equality == byte equality, including UTF-8 suffixes.
    */
  val suffixes: java.util.HashSet[String] = {
    val set = new java.util.HashSet[String](4096)
    val in = getClass.getResourceAsStream("/graft/psl_snapshot.dat")
    require(in != null, "psl_snapshot.dat missing from resources")
    val src = scala.io.Source.fromInputStream(in)(
      scala.io.Codec(StandardCharsets.UTF_8))
    try {
      src.getLines().foreach { raw =>
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          val bytes = line.getBytes(StandardCharsets.UTF_8)
          set.add(new String(bytes, StandardCharsets.ISO_8859_1))
        }
      }
    } finally src.close()
    set
  }

  /** Zero-allocation byte-slice view of the suffix set: all suffix bytes in
    * one blob, open-addressing table of (offset, len), probed by hashing
    * the candidate slice directly. The String-per-dot probe through the
    * HashSet was ~8% of scan CPU (JFR) — every dot of every domain anchor
    * allocated and hashed a fresh String.
    */
  private object ByteSet {
    private val entries: Array[Array[Byte]] = {
      val it = suffixes.iterator()
      val buf = new scala.collection.mutable.ArrayBuffer[Array[Byte]](
        suffixes.size())
      while (it.hasNext) buf +=
        it.next().getBytes(StandardCharsets.ISO_8859_1)
      buf.toArray
    }
    val maxLen: Int = entries.iterator.map(_.length).max
    private val cap: Int = {
      var c = 16
      while (c < entries.length * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val slot = Array.fill[Array[Byte]](cap)(null)
    entries.foreach { e =>
      var i = hashBytes(e, 0, e.length) & mask
      while (slot(i) != null && !java.util.Arrays.equals(slot(i), e))
        i = (i + 1) & mask
      slot(i) = e
    }

    @inline private def hashBytes(b: Array[Byte], from: Int, to: Int): Int = {
      var h = -2128831035 // FNV-1a
      var i = from
      while (i < to) { h = (h ^ (b(i) & 0xff)) * 16777619; i += 1 }
      h ^ (h >>> 16)
    }

    def contains(b: Array[Byte], from: Int, to: Int): Boolean = {
      val len = to - from
      var i = hashBytes(b, from, to) & mask
      var e = slot(i)
      while (e != null) {
        if (e.length == len) {
          var j = 0
          while (j < len && e(j) == b(from + j)) j += 1
          if (j == len) return true
        }
        i = (i + 1) & mask
        e = slot(i)
      }
      false
    }
  }

  /** Find the byte position (relative to `from`) of the dot introducing a
    * valid PSL suffix in bytes[from, to), walking right-to-left (shortest
    * suffix first — same walk as the reference's
    * find_valid_tld_suffix_bytes). Returns -1 if none.
    */
  def tldSuffixPos(bytes: Array[Byte], from: Int, to: Int): Int = {
    // dots left of minI would introduce suffixes longer than any PSL entry
    // (the suffix always extends to `to`), so the leftward walk can stop
    val minI = math.max(from, to - 1 - ByteSet.maxLen)
    var i = to - 1
    while (i >= minI) {
      if (bytes(i) == '.' && ByteSet.contains(bytes, i + 1, to))
        return i - from
      i -= 1
    }
    -1
  }
}
