package graft.intel

/** Aho-Corasick multi-pattern substring automaton over chars — the
  * prefilter core of the paraglob structure (reference:
  * crates/matchy-paraglob, which compiles pattern meta-words into an AC
  * automaton and glob-verifies only candidate patterns; SURVEY.md §4.1).
  *
  * Build: trie + BFS fail links, per-node output lists merged through the
  * fail chain (so probing never walks fail links for outputs). Probe:
  * goto/fail walk, O(text + matches).
  *
  * Transitions live in one open-addressing long->int table keyed by
  * (node << 32 | char) — no per-node maps, no boxing on the probe path.
  */
final class AhoCorasick private (
    keys: Array[Long],
    vals: Array[Int],
    mask: Int,
    fail: Array[Int],
    out: Array[Array[Int]],
    val nWords: Int
) extends Serializable {

  @inline private def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val key = (s.toLong << 32) | c.toLong
      var idx = (java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L)) & mask
      var found = -1
      var probing = true
      while (probing) {
        val k = keys(idx)
        if (k == key) { found = vals(idx); probing = false }
        else if (k == -1L) probing = false
        else idx = (idx + 1) & mask
      }
      if (found >= 0) return found
      if (s == 0) return 0
      s = fail(s)
    }
    0
  }

  /** Walk `text`, stamping found word ids into `seen` with `gen` (a
    * generation-stamped scratch: seen(w) == gen means found). Returns the
    * number of DISTINCT words found and appends their ids to `foundIds`.
    */
  def findWords(text: String, seen: Array[Int], gen: Int,
      foundIds: Array[Int]): Int = {
    var n = 0
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      val os = out(state)
      var j = 0
      while (j < os.length) {
        val w = os(j)
        if (seen(w) != gen) {
          seen(w) = gen
          foundIds(n) = w
          n += 1
        }
        j += 1
      }
      i += 1
    }
    n
  }
}

object AhoCorasick {

  /** Build from distinct words; word i gets id i. */
  def build(words: Array[String]): AhoCorasick = {
    // trie with per-node HashMap (construction only)
    val trans = new scala.collection.mutable.ArrayBuffer[java.util.HashMap[Character, Integer]]()
    val outB = new scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Int]]()
    def newNode(): Int = {
      trans += new java.util.HashMap[Character, Integer]()
      outB += new scala.collection.mutable.ArrayBuffer[Int](1)
      trans.length - 1
    }
    newNode() // root
    var w = 0
    while (w < words.length) {
      val word = words(w)
      var s = 0
      var i = 0
      while (i < word.length) {
        val c = Character.valueOf(word.charAt(i))
        val nxt = trans(s).get(c)
        s = if (nxt != null) nxt.intValue()
        else { val n = newNode(); trans(s).put(c, Integer.valueOf(n)); n }
        i += 1
      }
      outB(s) += w
      w += 1
    }
    val n = trans.length
    val fail = new Array[Int](n)
    // BFS fail links + output merging
    val queue = new java.util.ArrayDeque[Integer]()
    trans(0).forEach { (_, v) => queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      trans(u).forEach { (c, v) =>
        queue.add(v)
        var f = fail(u)
        var nxt = trans(f).get(c)
        while (nxt == null && f != 0) { f = fail(f); nxt = trans(f).get(c) }
        val fv = if (nxt != null && nxt.intValue() != v.intValue())
          nxt.intValue() else 0
        fail(v.intValue()) = fv
        outB(v.intValue()) ++= outB(fv)
      }
    }
    // flatten transitions into one open-addressing table
    var nEdges = 0
    trans.foreach(m => nEdges += m.size())
    var cap = 16
    while (cap < nEdges * 2) cap <<= 1
    val keys = Array.fill[Long](cap)(-1L)
    val vals = new Array[Int](cap)
    val mask = cap - 1
    var s = 0
    while (s < n) {
      val st = s
      trans(s).forEach { (c, v) =>
        val key = (st.toLong << 32) | c.charValue().toLong
        var idx = (java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L)) & mask
        while (keys(idx) != -1L) idx = (idx + 1) & mask
        keys(idx) = key
        vals(idx) = v.intValue()
      }
      s += 1
    }
    val out = outB.map(b => if (b.isEmpty) EMPTY else b.toArray).toArray
    new AhoCorasick(keys, vals, mask, fail, out, words.length)
  }

  private val EMPTY = Array.emptyIntArray
}
