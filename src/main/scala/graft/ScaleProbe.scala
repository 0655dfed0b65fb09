package graft

import graft.pipeline.Fixtures
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe for the session-4 query-layer operators
  * (exactSubstrStats / dedupLines / capPerKey) far beyond the sf fixtures:
  * a spark.range-generated corpus of `n` multi-line documents built from
  * the Fixtures turn text (heavy cross-document boilerplate — every filler
  * sentence repeats corpus-wide, the WORST case for the duplicate-span and
  * line-dedup families: nearly every window/line is flagged). Prints
  * wall-clock + output rows + docs/s per op; does not touch bench
  * artifacts.
  *
  * Usage: runMain graft.ScaleProbe [nDocs] [op-substring]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val only = if (args.length > 1) args(1) else ""
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 3 fixture turns per document, newline-joined: ~40 tokens / 4 lines
    // (the id line keeps every document distinct)
    val docs = spark.range(n)
      .mapPartitions(_.map(i => (i,
        s"doc $i begins\n" + Fixtures.text(i * 3) + "\n" +
          Fixtures.text(i * 3 + 1) + "\n" + Fixtures.text(i * 3 + 2))))
      .toDF("doc_id", "text")
      .localCheckpoint() // time the OPERATOR, not the generator

    def probe(name: String)(f: => Long): Unit =
      if (only.isEmpty || name.contains(only)) {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SCALEPROBE $name n=$n rows=$rows $sec%.1f s " +
          f"${n / sec}%.0f docs/s")
      }

    probe("exact_substr") {
      graft.ops.Dedup.exactSubstrStats(docs, n = 8)
        .agg(count(lit(1)), sum("dup_tokens")).collect()(0).getLong(0)
    }
    probe("dedup_lines") {
      graft.ops.Dedup.dedupLines(docs, minCount = 3)
        .agg(count(lit(1)), sum("n_removed")).collect()(0).getLong(0)
    }
    probe("cap_per_key") {
      // ~n/1000 keys, ~1000 docs each, quota 100 -> cap bites every key
      // (floor of 1 key: pmod by 0 is an ANSI ArithmeticException for
      // sub-1000 smoke runs)
      val keys = math.max(1L, n / 1000)
      graft.ops.Sampling.capPerKey(
        docs.withColumn("k", pmod(col("doc_id"), lit(keys)).cast("string")),
        "k", maxPerKey = 100).count()
    }
    spark.stop()
  }
}
