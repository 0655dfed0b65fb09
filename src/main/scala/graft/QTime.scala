package graft
import org.apache.spark.sql.SparkSession

/** Time a subset of driver queries (comma-separated substrings in args(0))
  * against args(1) (default sf0.1) without touching bench artifacts.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val filter = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.exists(n.contains) }
      .foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        val c = fn(spark, dir).count()
        println(f"$n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
    spark.stop()
  }
}
