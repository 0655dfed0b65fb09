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

  /** Find the byte position (relative to `from`) of the dot introducing a
    * valid PSL suffix in bytes[from, to), walking right-to-left (shortest
    * suffix first — same walk as the reference's
    * find_valid_tld_suffix_bytes). Returns -1 if none.
    */
  def tldSuffixPos(bytes: Array[Byte], from: Int, to: Int): Int = {
    var i = to - 1
    while (i >= from) {
      if (bytes(i) == '.') {
        val suffix = new String(bytes, i + 1, to - i - 1,
          StandardCharsets.ISO_8859_1)
        if (suffixes.contains(suffix)) return i - from
      }
      i -= 1
    }
    -1
  }
}
