package graft

import graft.intel.IntelDb
import graft.pipeline.{Fixtures, ScanJob}
import org.apache.spark.sql.SparkSession

/** Profiling harness: loop one pipeline stage for a fixed wall time so JFR
  * (-XX:StartFlightRecording) sees a steady hot loop. Run directly with
  * java and a classpath of the spark jars dir + target classes (no sbt
  * lock needed).
  * Env: SPARK_GRAFT_HOT_CORES (8), SPARK_GRAFT_HOT_SEC (60),
  * SPARK_GRAFT_HOT_STAGE (matched|extract|scanturn|scan),
  * SPARK_GRAFT_BENCH_TURNS (6000000).
  */
object HotMain {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_HOT_CORES", "8").toInt
    val secs = sys.env.getOrElse("SPARK_GRAFT_HOT_SEC", "60").toInt
    val stage = sys.env.getOrElse("SPARK_GRAFT_HOT_STAGE", "matched")
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "6000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val turnsDir = Bench.materializeTurns(nTurns, cores)
    val t = spark.read.parquet(turnsDir)
    def dbs() = Seq(
      IntelDb.build("threats", Fixtures.intelThreats),
      IntelDb.build("allowlist", Fixtures.intelAllowlist))
    import org.apache.spark.sql.functions._
    val df = stage match {
      case "scan" => t.select(col("text"))
      case "extract" => ScanJob.candidates(t)
      case "scanturn" => t.select(col("conv_id"), col("turn_idx"), col("role"),
        explode(graft.functions.ScanTurn.column(col("text"), dbs())).as("r"))
      case _ => ScanJob.matched(t, dbs(), spark)
    }
    val rdd = df.queryExecution.toRdd
    val counter = (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
    }
    def pass(): Long =
      rdd.mapPartitions(it => Iterator.single(counter(it))).collect().sum
    pass() // warm
    val stop = System.nanoTime() + secs * 1e9.toLong
    var passes = 0
    val t0 = System.nanoTime()
    while (System.nanoTime() < stop) { pass(); passes += 1 }
    val el = (System.nanoTime() - t0) / 1e9
    println(f"HOT stage=$stage cores=$cores passes=$passes " +
      f"turns_per_sec=${passes * nTurns / el}%.0f elapsed=$el%.1f")
    spark.stop()
  }
}
