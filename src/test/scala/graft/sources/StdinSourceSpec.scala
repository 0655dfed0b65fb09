package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S3: stdin source — line-per-turn semantics of the reference's `-` path
  * (bin/match_processor/sequential.rs:27-35), turn-shaped so the whole
  * pipeline runs on piped input unchanged.
  */
class StdinSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def stream(s: String) =
    new ByteArrayInputStream(s.getBytes(StandardCharsets.UTF_8))

  test("stdin: one turn per line, transcript schema, stable ordering") {
    val df = StdinSource.readTurns(spark,
      stream("first line with 1.2.3.4\nsecond line, clean\n"),
      tsMillis = Some(1700000000000L))
    assert(df.columns.toSeq ==
      Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    val rows = df.orderBy("turn_idx").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "stdin" && rows(0).getInt(1) == 0)
    assert(rows(0).getString(3) == "first line with 1.2.3.4")
    assert(rows(1).getInt(1) == 1 &&
      rows(1).getString(3) == "second line, clean")
    assert(rows(0).getTimestamp(5).getTime == 1700000000000L)
  }

  test("stdin: feeds extraction unchanged (pipe -> extract_iocs)") {
    val df = StdinSource.readTurns(spark,
      stream("hit 10.0.0.1 and evil.com here\nnothing\n"))
    val iocs = df
      .select(col("turn_idx"),
        explode(GraftFunctions.extract_iocs(col("text"))).as("ioc"))
      .select(col("turn_idx"), col("ioc.indicator_type"), col("ioc.value"))
      .collect()
    assert(iocs.forall(_.getInt(0) == 0))
    val byType = iocs.map(r => r.getString(1) -> r.getString(2)).toMap
    assert(byType("ipv4") == "10.0.0.1")
    assert(byType("domain") == "evil.com")
  }

  test("stdin: empty stream yields an empty, well-formed frame") {
    val df = StdinSource.readTurns(spark, stream(""))
    assert(df.count() == 0)
    assert(df.columns.contains("text"))
  }

  test("stdin: explicit slice count controls downstream parallelism") {
    val many = (0 until 100).map(i => s"line $i").mkString("\n")
    val df = StdinSource.readTurns(spark, stream(many), slices = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
  }

  test("stdin: pipes beyond the chunk bound spool to parquet with driver " +
    "residency of ONE chunk; rows, order, and values intact (round-5 fix)") {
    val n = 357
    val many = (0 until n).map(i => s"spool line $i").mkString("\n") + "\n"
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stdin-spool-spec").toString
    val df = StdinSource.readTurns(spark, stream(many),
      tsMillis = Some(1700000000000L),
      spoolChunkLines = 100, spoolDir = Some(dir))
    // the frame is a real file scan over the spool, not a parallelize
    assert(df.queryExecution.executedPlan.toString.contains("FileScan"))
    // 4 chunk files of <= 100 lines each landed in the spool
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) >= 4)
    val rows = df.orderBy("turn_idx")
      .select("turn_idx", "text", "conv_id").collect()
    assert(rows.length == n)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i && r.getString(1) == s"spool line $i" &&
        r.getString(2) == "stdin", s"row $i: $r")
    }
    // exactly-chunk-sized input also round-trips (boundary)
    val exact = StdinSource.readTurns(spark,
      stream((0 until 100).map(i => s"x$i").mkString("\n") + "\n"),
      spoolChunkLines = 100,
      spoolDir = Some(java.nio.file.Files
        .createTempDirectory("graft-stdin-spool-spec2").toString))
    assert(exact.count() == 100)
  }
}
