package graft.streaming

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** StreamingDrift — incremental CUSUM with checkpointed fold state. */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def awaitOrFail(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long = 180000L): Unit = {
    val done = q.awaitTermination(timeoutMs)
    if (!done) {
      q.stop()
      fail(s"streaming query did not terminate within ${timeoutMs}ms")
    }
  }

  private def row(k: String, period: Long, value: Long): String =
    s"""{"k":"$k","period":$period,"value":$value}"""

  private def alarms(outDir: String) =
    spark.read.parquet(s"$outDir/alarms").collect().map { r =>
      (r.getAs[String]("key"), r.getAs[Long]("period"),
        r.getAs[Long]("value"),
        Option(r.getAs[java.lang.Long]("cusum")).map(_.longValue()),
        Option(r.getAs[java.lang.Boolean]("alarm")).map(_.booleanValue()),
        r.getAs[Boolean]("late"))
    }.toSeq.sortBy(t => (t._1, t._2))

  test("batch-split invariance: the stream folded across three " +
    "restarts equals ChangePoint.cusum over the concatenated series, " +
    "bit for bit") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("drift-in").toString
    val outDir = Files.createTempDirectory("drift-out").toString
    // series per key: 'ramp' drifts up and alarms; 'calm' never does.
    // drift=10, threshold=25.
    val series = Seq(
      ("ramp", 1L, 12L), ("ramp", 2L, 18L), ("ramp", 3L, 20L),
      ("ramp", 4L, 30L), ("ramp", 5L, 9L),
      ("calm", 1L, 10L), ("calm", 2L, 11L), ("calm", 3L, 8L),
      ("calm", 4L, 10L))
    // split 2 / 4 / 3 across micro-batches (restart between each)
    val splits = Seq(series.take(2), series.slice(2, 6), series.drop(6))
    splits.zipWithIndex.foreach { case (chunk, i) =>
      Files.writeString(Paths.get(inDir, s"b$i.json"),
        chunk.map((row _).tupled).mkString("", "\n", "\n"))
      awaitOrFail(StreamingDrift.start(spark, inDir, outDir,
        drift = 10L, threshold = 25L))
    }
    val got = alarms(outDir)
    assert(got.forall(!_._6), "no row should be late")
    val expected = graft.ops.ChangePoint.cusum(
      series.toDF("key", "period", "value"), drift = 10L, threshold = 25L)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      .sortBy(t => (t._1, t._2))
    assert(got.map(t => (t._1, t._2, t._3, t._4.get, t._5.get)) == expected)
    // and the fixture is non-degenerate: ramp alarms, calm never does
    assert(got.exists(t => t._1 == "ramp" && t._5.contains(true)))
    assert(got.filter(_._1 == "calm").forall(_._5.contains(false)))
  }

  test("late rows: an already-folded period arriving later is an audit " +
    "row (late=true, NULL cusum/alarm) and never moves the state") {
    val inDir = Files.createTempDirectory("drift-in2").toString
    val outDir = Files.createTempDirectory("drift-out2").toString
    Files.writeString(Paths.get(inDir, "b0.json"),
      row("k", 1, 15) + "\n" + row("k", 2, 15) + "\n")
    awaitOrFail(StreamingDrift.start(spark, inDir, outDir, 10L, 25L))
    // period 2 again (a correction) and period 1 (a straggler): both late
    Files.writeString(Paths.get(inDir, "b1.json"),
      row("k", 2, 99) + "\n" + row("k", 1, 99) + "\n")
    awaitOrFail(StreamingDrift.start(spark, inDir, outDir, 10L, 25L))
    // period 3 folds against the UNCHANGED state (5 + 15 - 10 = 10)
    Files.writeString(Paths.get(inDir, "b2.json"), row("k", 3, 15) + "\n")
    awaitOrFail(StreamingDrift.start(spark, inDir, outDir, 10L, 25L))
    val got = alarms(outDir)
    val late = got.filter(_._6)
    assert(late.map(t => (t._2, t._3)).sorted == Seq((1L, 99L), (2L, 99L)))
    assert(late.forall(t => t._4.isEmpty && t._5.isEmpty))
    assert(got.filter(t => !t._6).map(t => (t._2, t._4.get)) ==
      Seq((1L, 5L), (2L, 10L), (3L, 15L)))
  }

  test("poison-pill immunity: malformed lines and NULL key/period drop " +
    "at ingest; NULL value counts 0 (the batch op's coalesce)") {
    val inDir = Files.createTempDirectory("drift-in3").toString
    val outDir = Files.createTempDirectory("drift-out3").toString
    Files.writeString(Paths.get(inDir, "b0.json"),
      "garbage line\n" +
        """{"k":null,"period":1,"value":5}""" + "\n" +
        """{"k":"k","period":null,"value":5}""" + "\n" +
        """{"k":"k","period":1,"value":null}""" + "\n" +
        row("k", 2, 40) + "\n")
    awaitOrFail(StreamingDrift.start(spark, inDir, outDir, 10L, 25L))
    val got = alarms(outDir)
    // only the two well-keyed rows survive; null value folds as 0
    assert(got.map(t => (t._2, t._3, t._4.get, t._5.get)) ==
      Seq((1L, 0L, 0L, false), (2L, 40L, 30L, true)))
  }
}
