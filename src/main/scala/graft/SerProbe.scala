package graft
import graft.intel.IntelDb
import graft.model.IntelEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: is the per-TASK cost of carrying a large IntelDb through the
  * expression reference dominating lookup benchmarks?
  */
object SerProbe {
  def main(args: Array[String]): Unit = {
    val n = 100000
    val entries = (0 until n).map(i =>
      IntelEntry(s"*seg${i}a*seg${i}b*", "high", "bench", "bench", 50))
    val db = IntelDb.build("bench", entries)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (parts <- Seq(64, 4)) {
      val keys = spark.range(0L, 200000L, 1L, parts)
        .map { r => val j = (r % n).toInt
          (if (r % 10 == 0) s"pre seg${j}a mid seg${j}b post"
           else s"pre seg${j}a mid seg${j}x post", "domain") }
        .toDF("value", "indicator_type")
      val probed = keys.select(size(graft.functions.IntelLookupMulti.column(
        col("value"), col("indicator_type"), Seq(db))).as("nhits"))
      probed.agg(sum("nhits")).head() // warm
      val t = System.nanoTime()
      probed.agg(sum("nhits")).head()
      println(f"parts=$parts sec=${(System.nanoTime()-t)/1e9}%.2f")
    }
    spark.stop()
  }
}
