package graft
import org.apache.spark.sql.SparkSession
/** Library-surface probe: flagship entry() + full ScanJob.run with resume. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // flagship
    val m = SparkEntry.entry(spark)
    println(s"PROBE entry rows=${m.count()}")
    m.show(3, truncate = false)
    // full run with sinks + resume
    val turns = spark.createDataFrame(graft.pipeline.Fixtures.turns(5000))
    val dbs = Seq(
      graft.intel.IntelDb.build("threats", graft.pipeline.Fixtures.intelThreats),
      graft.intel.IntelDb.build("allowlist", graft.pipeline.Fixtures.intelAllowlist))
    val out = "/tmp/probe-scan-out"
    val st1 = graft.pipeline.ScanJob.run(spark, turns, dbs, out,
      graft.pipeline.ScanJob.RunConfig(buckets = 8, runId = "probe-1"))
    println(s"PROBE run1 stats=${st1.toSeq.sorted.mkString(", ")}")
    val st2 = graft.pipeline.ScanJob.run(spark, turns, dbs, out,
      graft.pipeline.ScanJob.RunConfig(buckets = 8, resume = true, runId = "probe-2"))
    println(s"PROBE run2(resume) total_matches=${st2("total_matches")} (must equal run1=${st1("total_matches")})")
    println("PROBE sinks: " + new java.io.File(out).list().sorted.mkString(", "))
    println("PROBE routed sinks: " + new java.io.File(out + "/routed").list().sorted.mkString(", "))
    println("PROBE matched partitions: " + new java.io.File(out + "/routed/sink=matched").list().count(_.startsWith("bucket=")))
    spark.stop()
  }
}
