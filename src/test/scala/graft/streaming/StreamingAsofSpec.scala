package graft.streaming

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** StreamingAsof — latest-known-state temporal enrichment across
  * micro-batches (checkpointed keyed state).
  */
class StreamingAsofSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def awaitOrFail(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long = 180000L): Unit = {
    val done = q.awaitTermination(timeoutMs)
    if (!done) {
      q.stop()
      fail(s"streaming query did not terminate within ${timeoutMs}ms")
    }
  }

  private def ts(sec: Long) = f"2024-01-01T00:${sec / 60}%02d:${sec % 60}%02d.000Z"
  private def probeJson(id: Long, k: Long, sec: Long): String =
    s"""{"event_id":$id,"k":$k,"ts":"${ts(sec)}"}"""
  private def buildJson(bid: Long, k: Long, sec: Long, v: String): String =
    s"""{"bid":$bid,"k":$k,"ts":"${ts(sec)}","v":"$v"}"""

  private def enriched(outDir: String): Map[Long, (Option[Long], Option[String])] =
    spark.read.parquet(s"$outDir/enriched").collect().map { r =>
      r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("bid")).map(_.longValue()),
          Option(r.getAs[String]("v"))))
    }.toMap

  test("within-batch event-time order, cross-batch carried state, " +
    "late-probe NULL-over-wrong, equal-ts largest-bid tie") {
    val pDir = Files.createTempDirectory("asof-p").toString
    val bDir = Files.createTempDirectory("asof-b").toString
    val outDir = Files.createTempDirectory("asof-out").toString

    // batch 1: one build at t=10; probes before (t=5) and after (t=15);
    // plus an equal-ts pair of builds at t=10 for key 9 — bid 101 wins
    Files.writeString(Paths.get(pDir, "p1.json"),
      probeJson(1, 7, 5) + "\n" + probeJson(2, 7, 15) + "\n" +
        probeJson(3, 9, 10) + "\n")
    Files.writeString(Paths.get(bDir, "b1.json"),
      buildJson(100, 7, 10, "a") + "\n" +
        buildJson(101, 9, 10, "hi") + "\n" + buildJson(99, 9, 10, "lo") + "\n")
    awaitOrFail(StreamingAsof.start(spark, pDir, bDir, outDir))
    val got1 = enriched(outDir)
    assert(got1(1L) == ((None, None)))            // before any state
    assert(got1(2L) == ((Some(100L), Some("a")))) // in-batch build
    assert(got1(3L) == ((Some(101L), Some("hi")))) // equal-ts: bid 101

    // batch 2 (restarted query, checkpointed state): a probe with no
    // build in ITS batch is enriched from the CARRIED state
    Files.writeString(Paths.get(pDir, "p2.json"),
      probeJson(4, 7, 20) + "\n")
    awaitOrFail(StreamingAsof.start(spark, pDir, bDir, outDir))
    assert(enriched(outDir)(4L) == ((Some(100L), Some("a"))))

    // batch 3: a NEW build at t=30 plus a probe at t=25 (before the new
    // build's event time -> still the OLD carried state) and t=35 (new)
    Files.writeString(Paths.get(pDir, "p3.json"),
      probeJson(5, 7, 25) + "\n" + probeJson(6, 7, 35) + "\n")
    Files.writeString(Paths.get(bDir, "b3.json"),
      buildJson(102, 7, 30, "b") + "\n")
    awaitOrFail(StreamingAsof.start(spark, pDir, bDir, outDir))
    val got3 = enriched(outDir)
    assert(got3(5L) == ((Some(100L), Some("a"))))
    assert(got3(6L) == ((Some(102L), Some("b"))))

    // batch 4: a LATE probe older than the carried state's event time
    // gets NULL, never the newer state (null-over-wrong)
    Files.writeString(Paths.get(pDir, "p4.json"),
      probeJson(7, 7, 8) + "\n")
    awaitOrFail(StreamingAsof.start(spark, pDir, bDir, outDir))
    assert(enriched(outDir)(7L) == ((None, None)))
  }

  test("poison-pill immunity: malformed JSON lines are dropped, the " +
    "query drains, and keys never match through NULL") {
    val pDir = Files.createTempDirectory("asof-p2").toString
    val bDir = Files.createTempDirectory("asof-b2").toString
    val outDir = Files.createTempDirectory("asof-out2").toString
    Files.writeString(Paths.get(pDir, "p1.json"),
      "not json at all\n" + probeJson(1, 7, 15) + "\n" +
        s"""{"event_id":2,"k":null,"ts":"${ts(15)}"}""" + "\n")
    Files.writeString(Paths.get(bDir, "b1.json"),
      s"""{"bid":100,"k":null,"ts":"${ts(10)}","v":"x"}""" + "\n" +
        buildJson(101, 7, 10, "real") + "\n")
    awaitOrFail(StreamingAsof.start(spark, pDir, bDir, outDir))
    val got = enriched(outDir)
    assert(got == Map(1L -> ((Some(101L), Some("real")))))
  }
}
