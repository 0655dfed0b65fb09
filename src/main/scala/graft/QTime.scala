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
    // args(2) = repeats (default 1): repeat each query in the same session
    // so the later passes measure warm-JIT plan+execute, the thing the
    // full bench context provides naturally
    val repeats = if (args.length > 2) args(2).toInt else 1
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.exists(n.contains) }
      .foreach { case (n, fn) =>
        for (r <- 1 to repeats) {
          val t0 = System.nanoTime()
          val c = fn(spark, dir).count()
          println(f"$n#$r ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
        }
      }
    spark.stop()
  }
}
