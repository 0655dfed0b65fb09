package graft

import graft.intel.IntelDb
import graft.pipeline.Fixtures
import org.apache.spark.unsafe.types.UTF8String

/** Supplementary scaling evidence (round 6, VERDICT r05 item 7) — NOT part
  * of the frozen driver bench contract (Bench.scala is untouched).
  *
  * The driver bench's secondary 8→32 pair measures the FULL pipeline
  * (parquet decode + row materialization + scan), which on this box is
  * bounded by the memory-bandwidth calibration (membw_eff_8to32 ≈ 0.45),
  * so the pipeline's in-box 8→32 number conflates code scaling with the
  * host's bandwidth ceiling. This main isolates the COMPUTE: the full
  * per-turn extract+lookup (ScanTurnFlat.scan — the same function the
  * pipeline's generator calls) over pre-staged in-memory texts, with
  * plain JVM threads, no Spark, no parquet, no shuffle. If THIS scales
  * near the pure-arithmetic calibration, the 8→32 shortfall of the
  * pipeline is attributable to the box's memory subsystem, not the code.
  *
  * Methodology mirrors Bench: interleaved A/B windows (8 ↔ 32 threads),
  * a discarded warm-up round, median of per-round ratios, plus the
  * arithmetic calibration ratio measured in the same process for
  * comparison. Output: one JSON line + BENCH_EXTRA.json.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nTexts = sys.env.getOrElse("SPARK_GRAFT_EXTRA_TEXTS", "200000").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_EXTRA_ROUNDS", "5").toInt
    val windowSec =
      sys.env.getOrElse("SPARK_GRAFT_EXTRA_WINDOW_SEC", "3.0").toDouble
    val loT = 8
    val hiT = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val dbs = Array(
      IntelDb.build("threats", Fixtures.intelThreats),
      IntelDb.build("allowlist", Fixtures.intelAllowlist))
    val scanner = new graft.extract.IocScanner(graft.extract.ScanConfig())
    val texts = new Array[UTF8String](nTexts)
    var bytes = 0L
    var i = 0
    while (i < nTexts) {
      texts(i) = UTF8String.fromString(Fixtures.text(i.toLong))
      bytes += texts(i).numBytes()
      i += 1
    }

    /** One window at `threads` threads: each thread loops over its own
      * stride of the corpus until the deadline; returns turns/sec.
      */
    def window(threads: Int): Double = {
      val total = new java.util.concurrent.atomic.AtomicLong(0)
      val stop = System.nanoTime() + (windowSec * 1e9).toLong
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var done = 0L
          var rows = 0L
          while (System.nanoTime() < stop) {
            var j = t
            while (j < nTexts && System.nanoTime() < stop) {
              rows += graft.functions.ScanTurnFlat
                .scan(scanner, dbs, null, texts(j)).numElements()
              done += 1
              j += threads
            }
          }
          require(rows >= 0)
          total.addAndGet(done); ()
        })
      }
      val t0 = System.nanoTime()
      ts.foreach(_.start()); ts.foreach(_.join())
      total.get() / ((System.nanoTime() - t0) / 1e9)
    }

    // warm both shapes (JIT + scratch), then interleaved rounds
    window(loT); window(hiT)
    val lo = collection.mutable.ArrayBuffer[Double]()
    val hi = collection.mutable.ArrayBuffer[Double]()
    var r = 0
    while (r < rounds) {
      if (r % 2 == 0) { lo += window(loT); hi += window(hiT) }
      else { hi += window(hiT); lo += window(loT) }
      r += 1
    }
    val effs = lo.zip(hi).map { case (l, h) => (h / l) / (hiT.toDouble / loT) }
    val eff = Bench.median(effs.toSeq)

    // same-process arithmetic ceiling for attribution
    Bench.arithProbe(4, 0.5)
    val a8 = (1 to 3).map(_ => Bench.arithProbe(loT, 1.0)).max
    val a32 = (1 to 3).map(_ => Bench.arithProbe(hiT, 1.0)).max
    val arithEff = (a32 / a8) / (hiT.toDouble / loT)

    def arr(xs: Seq[Double]): String =
      xs.map(x => f"$x%.0f").mkString("[", ",", "]")
    val json =
      f"""{"metric":"compute_bound_scan_scaling","threads_low":$loT,""" +
        f""""threads_high":$hiT,"rounds":$rounds,""" +
        f""""turns_per_sec_low":${Bench.median(lo.toSeq)}%.0f,""" +
        f""""turns_per_sec_high":${Bench.median(hi.toSeq)}%.0f,""" +
        s""""samples_low":${arr(lo.toSeq)},"samples_high":${arr(hi.toSeq)},""" +
        f""""eff_8to32_compute":$eff%.3f,"arith_eff_8to32":$arithEff%.3f,""" +
        f""""corpus_mb":${bytes / 1e6}%.1f}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_EXTRA.json"), json + "\n")
    catch { case _: Throwable => () }
    println(json)
  }
}
