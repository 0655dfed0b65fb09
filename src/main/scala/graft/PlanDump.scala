package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-6 optimization tooling: dump `.explain("formatted")` of declared
  * queries to files (plans/<tag>/<query>.txt) so before/after plan claims
  * in OPTIMIZATION_r06.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [substr,substr,...]
  * Uses the same session shape as Bench's query stage (32 shuffle
  * partitions, AQE on) so the captured plan is the benched plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val filter = if (args.length > 2) args(2).split(',').toSeq else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.isEmpty || filter.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
          println(s"PLAN $name ok (${plan.length} chars)")
        } catch {
          case e: Throwable =>
            println(s"PLAN $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
