package graft.streaming

import graft.SparkTestBase
import graft.intel.IntelDb
import graft.model.IntelEntry
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StreamingScanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def turnJson(conv: String, idx: Int, text: String): String =
    s"""{"conv_id":"$conv","turn_idx":$idx,"role":"user","text":"$text","tool":"","ts":"2024-01-01T00:00:0$idx.000Z"}"""

  test("S4 follow-mode analog: micro-batches append to the matched sink") {
    val inDir = Files.createTempDirectory("stream-in").toString
    val outDir = Files.createTempDirectory("stream-out").toString
    val dbs = () => Seq(IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "f", 90),
      IntelEntry("evil.example.com", "high", "phishing", "f", 95))))

    Files.writeString(java.nio.file.Paths.get(inDir, "batch1.json"),
      turnJson("c1", 0, "hit 192.0.2.55 here") + "\n" +
        turnJson("c1", 1, "all clean") + "\n")

    val q1 = StreamingScan.start(spark, inDir, outDir, dbs)
    q1.awaitTermination()

    val m1 = spark.read.parquet(s"$outDir/matched_stream")
    assert(m1.count() == 1)
    assert(m1.select("value").head().getString(0) == "192.0.2.55")

    // append a second file -> only the new data is processed (checkpoint)
    Files.writeString(java.nio.file.Paths.get(inDir, "batch2.json"),
      turnJson("c2", 0, "see evil.example.com now") + "\n")
    val q2 = StreamingScan.start(spark, inDir, outDir, dbs)
    q2.awaitTermination()

    val m2 = spark.read.parquet(s"$outDir/matched_stream")
    assert(m2.count() == 2)
    assert(m2.where("indicator_type = 'domain'").count() == 1)
  }
}
