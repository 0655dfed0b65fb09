package graft

import graft.intel.IntelDb
import graft.pipeline.{Fixtures, ScanJob}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-decomposition profiler for the in-box thread-scaling question
  * (VERDICT r2 "what's wrong" #1): measures the scan pipeline CUMULATIVELY
  * by stage — parquet scan only, + extraction, + lookup/join — at two
  * parallelism levels, so the stage that stops scaling is directly visible
  * instead of inferred. Not part of the driver contract; a builder tool.
  *
  * Env: SPARK_GRAFT_PROF_CORES="8,32", SPARK_GRAFT_BENCH_TURNS,
  * SPARK_GRAFT_PROF_WINDOW_SEC.
  */
object ProfMain {

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-prof-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_PROF_CORES", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "6000000").toLong
    val windowSec =
      sys.env.getOrElse("SPARK_GRAFT_PROF_WINDOW_SEC", "5.0").toDouble
    val turnsDir = Bench.materializeTurns(nTurns, cores.max)

    def dbs() = Seq(
      IntelDb.build("threats", Fixtures.intelThreats),
      IntelDb.build("allowlist", Fixtures.intelAllowlist))

    // cumulative stages; each returns a DataFrame whose full materialization
    // is the measured work
    def stages(spark: SparkSession): Seq[(String, org.apache.spark.sql.DataFrame)] = {
      val t = spark.read.parquet(turnsDir)
      Seq(
        "1_scan_only" -> t.select(col("text")),
        "2_plus_extract" -> ScanJob.candidates(t),
        "3_full_matched" -> ScanJob.matched(t, dbs(), spark),
        "4_scanturn_routed" -> t.select(col("conv_id"), col("turn_idx"),
          col("role"),
          explode(graft.functions.ScanTurn.column(col("text"), dbs()))
            .as("r"))
      )
    }

    // Interleaved rounds: stage windows rotate (s1 s2 s3 s4, s1 s2 ...) so
    // a multi-minute host stall (observed: ~13 min of ~20x slowdown on
    // this shared VM) degrades ALL stages of a round, not one stage — the
    // per-stage MEDIAN across rounds then stays comparable.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROF_ROUNDS", "3").toInt
    val results =
      scala.collection.mutable.ArrayBuffer[(String, Int, Double)]()
    for (c <- cores) {
      val spark = newSession(c)
      val sts = stages(spark).map { case (name, df) =>
        val rdd = df.queryExecution.toRdd
        (name, rdd)
      }
      val counter =
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
        }
      // warm every stage: JIT single partitions + one full pass each
      for ((_, rdd) <- sts) {
        var w = 0
        while (w < math.min(4, rdd.getNumPartitions)) {
          spark.sparkContext.runJob(rdd, counter, Seq(w)); w += 1
        }
        rdd.mapPartitions(it => Iterator.single(counter(it))).collect()
      }
      val samples = scala.collection.mutable.Map[String,
        scala.collection.mutable.ArrayBuffer[Double]]()
      for (r <- 0 until rounds; (name, rdd) <- sts) {
        def pass(): Unit = {
          rdd.mapPartitions(it => Iterator.single(counter(it))).collect()
          ()
        }
        var passes = 0
        val t0 = System.nanoTime()
        var elapsed = 0.0
        while (elapsed < windowSec || passes < 1) {
          pass(); passes += 1
          elapsed = (System.nanoTime() - t0) / 1e9
        }
        val thr = passes * nTurns / elapsed
        samples.getOrElseUpdate(name,
          scala.collection.mutable.ArrayBuffer[Double]()) += thr
        println(f"PROF round=$r $name%-18s cores=$c%-3d " +
          f"turns_per_sec=$thr%.0f passes=$passes elapsed=$elapsed%.1f")
      }
      for ((name, _) <- sts) {
        val xs = samples(name).sorted
        val med = xs(xs.length / 2)
        results += ((name, c, med))
        println(f"PROF MEDIAN $name%-18s cores=$c%-3d " +
          f"turns_per_sec=$med%.0f samples=${xs.map(x => f"$x%.0f").mkString(",")}")
      }
      spark.stop()
      System.gc()
    }
    println("PROF ---- scaling (highest/lowest cores ratio / core ratio)")
    val lo = cores.min; val hi = cores.max
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, rs) =>
      val l = rs.find(_._2 == lo).map(_._3).getOrElse(0.0)
      val h = rs.find(_._2 == hi).map(_._3).getOrElse(0.0)
      if (l > 0 && h > 0 && lo != hi)
        println(f"PROF $name%-18s eff_${lo}_to_$hi=${(h / l) / (hi.toDouble / lo)}%.3f")
    }
  }
}
