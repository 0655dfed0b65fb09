package graft.io

import graft.SparkTestBase
import graft.intel.IntelDb
import graft.model.{IntelEntry, Turn}
import graft.pipeline.ScanJob
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** NDJSON field parity with the reference's match_processor output
  * (bin/match_processor/sequential.rs:154-187): exact emitted lines for one
  * ip match and one multi-pattern match.
  */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("ndjsonMatched emits the reference field shape, byte-exact") {
    import spark.implicits._
    val turns = Seq(
      Turn("c1", 0, "user", "ping 192.0.2.55 then evil.example.com end", "",
        new Timestamp(1700000000000L)))
    val db = IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "feed-a", 90),
      IntelEntry("evil.example.com", "critical", "phishing", "feed-a", 95),
      IntelEntry("*.example.com", "low", "heuristic", "feed-b", 40)))
    val matched = ScanJob.matched(spark.createDataFrame(turns), Seq(db), spark)
    val out = Files.createTempDirectory("ndjson-out").toString
    Sinks.ndjsonMatched(matched, "transcripts.log", lit(1700000000.0),
      s"$out/matches")
    val lines = spark.read.text(s"$out/matches").as[String].collect().sorted

    val ipLine =
      """{"cidr":"192.0.2.55/24","data":{"category":"c2","confidence":90,""" +
        """"source":"feed-a","threat_level":"high"},"match_type":"ip",""" +
        """"matched_text":"192.0.2.55","prefix_len":24,""" +
        """"source":"transcripts.log","timestamp":"1700000000.000"}"""
    // evil.example.com hits BOTH the literal (id for entry 1) and the glob
    // (entry 2) -> one line, pattern_count=2, data in ascending id order
    val patLine =
      """{"data":[{"category":"phishing","confidence":95,"source":"feed-a",""" +
        """"threat_level":"critical"},{"category":"heuristic",""" +
        """"confidence":40,"source":"feed-b","threat_level":"low"}],""" +
        """"match_type":"pattern","matched_text":"evil.example.com",""" +
        """"pattern_count":2,"source":"transcripts.log",""" +
        """"timestamp":"1700000000.000"}"""
    assert(lines.length == 2, lines.mkString("\n"))
    assert(lines.toSeq == Seq(ipLine, patLine).sorted, lines.mkString("\n"))
  }

  test("ndjsonMatched carries dynamic feed metadata in data.extra, " +
      "byte-exact and key-sorted") {
    import spark.implicits._
    val turns = Seq(
      Turn("c1", 0, "user", "ping 192.0.2.55 then evil.example.com end", "",
        new Timestamp(1700000000000L)))
    val db = IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "feed-a", 90,
        extra = Map("ttl" -> "3600", "campaign" -> "alpha")),
      // extra-less entry keeps the reference-exact shape (no extra member)
      IntelEntry("evil.example.com", "critical", "phishing", "feed-a", 95)))
    val matched = ScanJob.matched(spark.createDataFrame(turns), Seq(db), spark)
    val out = Files.createTempDirectory("ndjson-extra").toString
    Sinks.ndjsonMatched(matched, "transcripts.log", lit(1700000000.0),
      s"$out/matches")
    val lines = spark.read.text(s"$out/matches").as[String].collect().sorted
    // ttl is typed via CSV-style re-inference (no explicit tags on the
    // hand-built entry): the reference's DataValue system would carry
    // Int32(3600), so the JSON number is unquoted (round-5 DataValue
    // fidelity; matchy-data-format/src/lib.rs:49-77)
    val ipLine =
      """{"cidr":"192.0.2.55/24","data":{"category":"c2","confidence":90,""" +
        """"extra":{"campaign":"alpha","ttl":3600},"source":"feed-a",""" +
        """"threat_level":"high"},"match_type":"ip",""" +
        """"matched_text":"192.0.2.55","prefix_len":24,""" +
        """"source":"transcripts.log","timestamp":"1700000000.000"}"""
    val patLine =
      """{"data":[{"category":"phishing","confidence":95,"source":"feed-a",""" +
        """"threat_level":"critical"}],""" +
        """"match_type":"pattern","matched_text":"evil.example.com",""" +
        """"pattern_count":1,"source":"transcripts.log",""" +
        """"timestamp":"1700000000.000"}"""
    assert(lines.toSeq == Seq(ipLine, patLine).sorted, lines.mkString("\n"))
  }

  test("ndjsonMatched inlineExtra: dynamic keys at the data top level, " +
      "alphabetical across fixed+dynamic — the reference's own shape") {
    import spark.implicits._
    val turns = Seq(
      Turn("c1", 0, "user", "ping 192.0.2.55 then evil.example.com end", "",
        new Timestamp(1700000000000L)))
    val db = IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "feed-a", 90,
        extra = Map("ttl" -> "3600", "campaign" -> "alpha"),
        extra_types = Map("ttl" -> "i32", "campaign" -> "str")),
      // extra-less entry: the inline object is just the fixed map
      IntelEntry("evil.example.com", "critical", "phishing", "feed-a", 95)))
    val matched = ScanJob.matched(spark.createDataFrame(turns), Seq(db), spark)
    val out = Files.createTempDirectory("ndjson-inline").toString
    Sinks.ndjsonMatched(matched, "transcripts.log", lit(1700000000.0),
      s"$out/matches", inlineExtra = true)
    val lines = spark.read.text(s"$out/matches").as[String].collect().sorted
    // "campaign" sorts BEFORE "category", ttl after threat_level — the
    // flat serde_json BTreeMap order of sequential.rs:154-187
    val ipLine =
      """{"cidr":"192.0.2.55/24","data":{"campaign":"alpha",""" +
        """"category":"c2","confidence":90,"source":"feed-a",""" +
        """"threat_level":"high","ttl":3600},"match_type":"ip",""" +
        """"matched_text":"192.0.2.55","prefix_len":24,""" +
        """"source":"transcripts.log","timestamp":"1700000000.000"}"""
    val patLine =
      """{"data":[{"category":"phishing","confidence":95,""" +
        """"source":"feed-a","threat_level":"critical"}],""" +
        """"match_type":"pattern","matched_text":"evil.example.com",""" +
        """"pattern_count":1,"source":"transcripts.log",""" +
        """"timestamp":"1700000000.000"}"""
    assert(lines.toSeq == Seq(ipLine, patLine).sorted, lines.mkString("\n"))
  }

  test("ndjsonMatched renders ingest-captured DataValue types byte-exact: " +
      "numbers/bools unquoted, strings quoted, i64->Int32 truncation") {
    import spark.implicits._
    val turns = Seq(
      Turn("c1", 0, "user", "ping 192.0.2.55 end", "",
        new Timestamp(1700000000000L)))
    val db = IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "feed-a", 90,
        extra = Map("ttl" -> "6442450944", "score" -> "0.5",
          "verified" -> "true", "actor" -> "APT-1", "port" -> "0443"),
        extra_types = Map("ttl" -> "i32", "score" -> "f64",
          "verified" -> "bool", "actor" -> "str",
          // a JSON feed can carry a numeric-looking STRING — the captured
          // tag must keep it quoted (cli_utils.rs:228), where CSV
          // re-inference would have numbered it
          "port" -> "str"))))
    val matched = ScanJob.matched(spark.createDataFrame(turns), Seq(db), spark)
    val out = Files.createTempDirectory("ndjson-typed").toString
    Sinks.ndjsonMatched(matched, "transcripts.log", lit(1700000000.0),
      s"$out/matches")
    val lines = spark.read.text(s"$out/matches").as[String].collect()
    // 6442450944 = 0x1_8000_0000 truncates to Int32 -2147483648
    // (the reference's `i as i32`, match_cmd.rs:85)
    val expected =
      """{"cidr":"192.0.2.55/24","data":{"category":"c2","confidence":90,""" +
        """"extra":{"actor":"APT-1","port":"0443","score":0.5,""" +
        """"ttl":-2147483648,"verified":true},"source":"feed-a",""" +
        """"threat_level":"high"},"match_type":"ip",""" +
        """"matched_text":"192.0.2.55","prefix_len":24,""" +
        """"source":"transcripts.log","timestamp":"1700000000.000"}"""
    assert(lines.toSeq == Seq(expected), lines.mkString("\n"))
  }

  test("ScanJob.run emits the NDJSON stream when enabled (byte-exact line)") {
    import spark.implicits._
    val turns = Seq(
      Turn("c1", 0, "user", "ping 192.0.2.55 only", "",
        new Timestamp(1700000000000L)),
      Turn("c2", 0, "user", "all clean here", "",
        new Timestamp(1700000001000L)))
    val db = IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "feed-a", 90)))
    val out = Files.createTempDirectory("run-ndjson").toString + "/scan"
    ScanJob.run(spark, spark.createDataFrame(turns), Seq(db), out,
      ScanJob.RunConfig(buckets = 4, ndjson = true,
        ndjsonSource = "transcripts.log"))
    val lines = spark.read.text(s"$out/ndjson").as[String].collect()
    val expected =
      """{"cidr":"192.0.2.55/24","data":{"category":"c2","confidence":90,""" +
        """"source":"feed-a","threat_level":"high"},"match_type":"ip",""" +
        """"matched_text":"192.0.2.55","prefix_len":24,""" +
        """"source":"transcripts.log","timestamp":"1700000000.000"}"""
    assert(lines.toSeq == Seq(expected), lines.mkString("\n"))
  }

  test("ScanJob.run --ndjson-inline-extra: the flat reference shape " +
      "survives the routed parquet round trip (byte-exact line)") {
    import spark.implicits._
    val turns = Seq(
      Turn("c1", 0, "user", "ping 192.0.2.55 only", "",
        new Timestamp(1700000000000L)))
    val db = IntelDb.build("threats", Seq(
      IntelEntry("192.0.2.0/24", "high", "c2", "feed-a", 90,
        extra = Map("ttl" -> "3600"), extra_types = Map("ttl" -> "i32"))))
    val out = Files.createTempDirectory("run-ndjson-inline").toString + "/scan"
    ScanJob.run(spark, spark.createDataFrame(turns), Seq(db), out,
      ScanJob.RunConfig(buckets = 4, ndjson = true,
        ndjsonSource = "transcripts.log", ndjsonInlineExtra = true))
    val lines = spark.read.text(s"$out/ndjson").as[String].collect()
    val expected =
      """{"cidr":"192.0.2.55/24","data":{"category":"c2","confidence":90,""" +
        """"source":"feed-a","threat_level":"high","ttl":3600},""" +
        """"match_type":"ip","matched_text":"192.0.2.55","prefix_len":24,""" +
        """"source":"transcripts.log","timestamp":"1700000000.000"}"""
    assert(lines.toSeq == Seq(expected), lines.mkString("\n"))
    // the mode keeps data_json (its input) and drops extra_json (unused)
    val routed = spark.read.parquet(s"$out/routed")
    assert(routed.columns.contains("data_json"), routed.columns.mkString(","))
    assert(!routed.columns.contains("extra_json"), routed.columns.mkString(","))
  }
}
