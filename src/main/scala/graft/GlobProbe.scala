package graft
object GlobProbe {
  def main(args: Array[String]): Unit = {
    val n = 100000
    val entries = (0 until n).map(i => (s"*seg${i}a*seg${i}b*", i))
    val t0 = System.nanoTime()
    val idx = graft.intel.GlobIndex.build(entries, caseInsensitive = false)
    println(f"build ${(System.nanoTime()-t0)/1e9}%.2f s")
    var hits = 0L
    val t1 = System.nanoTime()
    var r = 0
    while (r < 200000) {
      val j = r % n
      val text = if (r % 10 == 0) s"pre seg${j}a mid seg${j}b post"
                 else s"pre seg${j}a mid seg${j}x post"
      hits += idx.findAll(text).length
      r += 1
    }
    val el = (System.nanoTime()-t1)/1e9
    println(f"lookups 200000 in $el%.2f s = ${200000/el}%.0f q/s hits=$hits")
  }
}
