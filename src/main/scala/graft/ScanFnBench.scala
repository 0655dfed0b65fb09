package graft

import graft.intel.{CleanPreScreen, IntelDb}
import graft.pipeline.Fixtures
import org.apache.spark.unsafe.types.UTF8String

/** Expression-level micro-benchmark: drives ScanTurnFlat.scan directly on
  * fixture texts in a plain JVM loop — no Spark session, no task
  * scheduling, no parquet — to isolate the per-turn extract+lookup cost
  * (and the clean-turn pre-screen's effect on it) from the host's Spark-
  * path noise. Args: [nTexts] [seconds] [screen|noscreen|both].
  */
object ScanFnBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val secs = if (args.length > 1) args(1).toInt else 8
    val mode = if (args.length > 2) args(2) else "both"
    val dbs = Array(
      IntelDb.build("threats", Fixtures.intelThreats),
      IntelDb.build("allowlist", Fixtures.intelAllowlist))
    val screen = CleanPreScreen.build(dbs.toSeq)
    val scanner = new graft.extract.IocScanner(graft.extract.ScanConfig())
    val texts = new Array[UTF8String](n)
    var bytes = 0L
    var i = 0
    while (i < n) {
      texts(i) = UTF8String.fromString(Fixtures.text(i.toLong))
      bytes += texts(i).numBytes()
      i += 1
    }
    // pre-screen selectivity on this corpus
    var rejected = 0
    i = 0
    while (i < n) {
      val t = texts(i)
      val scr = functions.ExtractIoCs.tlScratch.get()
      val buf = functions.ExtractIoCs.copyToScratch(scr, t)
      if (!screen.mightMatch(buf, t.numBytes())) rejected += 1
      i += 1
    }
    println(f"corpus: $n texts, ${bytes / 1e6}%.1f MB, prescreen rejects " +
      f"$rejected (${100.0 * rejected / n}%.1f%%)")

    def run(name: String, scr: CleanPreScreen): Unit = {
      // warm
      var w = 0
      while (w < 2) {
        i = 0; while (i < n) { functions.ScanTurnFlat.scan(scanner, dbs, scr, texts(i)); i += 1 }
        w += 1
      }
      val stop = System.nanoTime() + secs * 1000000000L
      var passes = 0
      var rows = 0L
      val t0 = System.nanoTime()
      while (System.nanoTime() < stop) {
        i = 0
        while (i < n) {
          rows += functions.ScanTurnFlat.scan(scanner, dbs, scr, texts(i)).numElements()
          i += 1
        }
        passes += 1
      }
      val el = (System.nanoTime() - t0) / 1e9
      println(f"$name%-10s ${passes.toLong * n / el}%.0f turns/s single-core " +
        f"(${passes * bytes / el / 1e6}%.1f MB/s), rows/pass=${rows / passes}")
    }
    if (mode != "screen") run("noscreen", null)
    if (mode != "noscreen") run("screen", screen)
    // A8 stats as bench evidence: memo hit rates on this corpus
    dbs.foreach { db =>
      val s = db.stats
      println(f"stats ${db.databaseId}%-10s ip=${s.ipLookups} " +
        f"(hit ${s.ipMemoHitRate * 100}%.1f%%, match ${s.ipMatchRate * 100}%.1f%%) " +
        f"str=${s.stringLookups} (hit ${s.stringMemoHitRate * 100}%.1f%%, " +
        f"match ${s.stringMatchRate * 100}%.1f%%)")
    }
  }
}
