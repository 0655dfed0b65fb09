package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the session-5 telemetry/log operators (sessionize is
  * covered by the flagship path; this drives the NEW family) far beyond
  * the sf fixtures: a spark.range-generated event stream of `n` rows —
  * ~n/1000 users, 5 event types, a month of synthetic timestamps, and a
  * structured log line per event (1-in-50 garbage for the dead-letter
  * path). Prints wall-clock + output rows + events/s per op; does not
  * touch bench artifacts.
  *
  * Usage: runMain graft.TelemetryScaleProbe [nEvents] [op-substring]
  */
object TelemetryScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val only = if (args.length > 1) args(1) else ""
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val users = math.max(1L, n / 1000)
    val types = array(lit("view"), lit("click"), lit("purchase"),
      lit("signup"), lit("error"))
    // xxhash64 scatter, not multiplicative hashing: a 64-bit multiply
    // overflows and Spark 4's ANSI mode makes that an ArithmeticException
    val events = spark.range(n).toDF("event_id")
      .withColumn("user_id",
        pmod(xxhash64(lit(1), col("event_id")), lit(users)))
      // ~a month of microsecond timestamps, deterministic scatter
      .withColumn("ts", timestamp_micros(lit(1704067200000000L) +
        pmod(xxhash64(lit(2), col("event_id")), lit(2592000000000L))))
      .withColumn("event_type", element_at(types,
        (pmod(xxhash64(lit(3), col("event_id")), lit(5)) + 1).cast("int")))
      .withColumn("value",
        (pmod(col("event_id") * 31L, lit(10000)) / lit(100.0)))
      .localCheckpoint() // time the OPERATOR, not the generator

    def probe(name: String)(f: => Long): Unit =
      if (only.isEmpty || name.contains(only)) {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TELEMPROBE $name n=$n rows=$rows $sec%.1f s " +
          f"${n / sec}%.0f events/s")
      }

    probe("sliding_rates") {
      graft.ops.Windows.slidingAgg(events, 3600, 900, "ts",
        Seq("event_type"), Seq(count(lit(1)).as("cnt"))).count()
    }
    probe("anomaly_mad") {
      graft.ops.Anomaly.madOutliers(events, Seq("event_type"), "value")
        .count()
    }
    probe("funnel") {
      graft.ops.Funnel.reachedCounts(events,
        Seq("view", "click", "purchase")).count()
    }
    probe("retention") {
      graft.ops.Retention.matrix(events).count()
    }
    probe("grok_parse") {
      val lines = events.select(concat(
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit(" "),
        when(col("event_id") % 50 === 0, "GARBAGE").otherwise("INFO"),
        lit(" user="), col("user_id"),
        lit(" type="), col("event_type"),
        lit(" msg=\"evt-"), col("event_id"), lit("\"")).as("line"))
      val pat = "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} " +
        "user=%{INT:user} type=%{WORD:type} msg=%{QUOTEDSTRING:msg}"
      graft.ops.LogParse.parse(lines, "line", pat)
        .groupBy("level", "_grok_matched").count().count()
    }
    spark.stop()
  }
}
