package graft.sources

import graft.SparkTestBase
import graft.intel.IntelDb
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class IntelIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("csv feed (S5): entry column + metadata, defaults filled") {
    val dir = Files.createTempDirectory("intel-csv")
    Files.writeString(dir.resolve("feed.csv"),
      """entry,threat_level,category,source,confidence
        |192.0.2.0/24,high,c2,feedA,90
        |evil.com,critical,phishing,feedA,95
        |*.bad.org,,malware,feedA,
        |""".stripMargin)
    val entries = IntelIngest.toEntries(
      IntelIngest.readCsv(spark, dir.toString + "/feed.csv"))
    assert(entries.size == 3)
    val byEntry = entries.map(e => e.entry -> e).toMap
    assert(byEntry("192.0.2.0/24").threat_level == "high")
    assert(byEntry("*.bad.org").threat_level == "unknown") // default
    assert(byEntry("*.bad.org").confidence == 0)
    val db = IntelDb.build("csv", entries)
    assert(db.lookupIp("192.0.2.9", isV6 = false) != null)
    assert(db.lookupString("x.bad.org").nonEmpty)
  }

  test("csv feed: columns outside the fixed shape survive in `extra`") {
    val dir = Files.createTempDirectory("intel-csv-extra")
    Files.writeString(dir.resolve("feed.csv"),
      """entry,category,campaign,actor,ttl
        |evil.com,phishing,alpha,APT-1,3600
        |bad.org,c2,beta,,900
        |""".stripMargin)
    val entries = IntelIngest.toEntries(
      IntelIngest.readCsv(spark, dir.toString + "/feed.csv"))
    val byEntry = entries.map(e => e.entry -> e).toMap
    assert(byEntry("evil.com").extra ==
      Map("actor" -> "APT-1", "campaign" -> "alpha", "ttl" -> "3600"))
    // empty CSV cell = null = absent key, not an empty-string value
    assert(byEntry("bad.org").extra ==
      Map("campaign" -> "beta", "ttl" -> "900"))
    assert(byEntry("evil.com").category == "phishing") // fixed cols intact
    // the compiled db carries extras key-sorted into its metadata
    val db = IntelDb.build("csv", entries)
    val m = db.entries.find(_.entry == "evil.com").get
    assert(m.extra.toSeq == Seq("actor" -> "APT-1", "campaign" -> "alpha",
      "ttl" -> "3600"))
  }

  test("json feed (S6): [{key, data}] shape") {
    val dir = Files.createTempDirectory("intel-json")
    Files.writeString(dir.resolve("feed.json"),
      """[{"key": "10.1.0.0/16", "data": {"threat_level": "low",
        |  "category": "scan", "source": "j", "confidence": 40}},
        | {"key": "bad.example", "data": {"threat_level": "high",
        |  "category": "c2", "source": "j", "confidence": 80}}]
        |""".stripMargin)
    val entries = IntelIngest.toEntries(
      IntelIngest.readJson(spark, dir.toString + "/feed.json"))
    assert(entries.size == 2)
    assert(entries.exists(e => e.entry == "10.1.0.0/16" &&
      e.threat_level == "low"))
  }

  test("csv feed: per-cell DataValue inference (match_cmd.rs:83-93 order)") {
    val dir = Files.createTempDirectory("intel-csv-typed")
    Files.writeString(dir.resolve("feed.csv"),
      """entry,ttl,big,score,exp,flag,name,lead,inf
        |evil.com,3600,18446744073709551615,0.5,1e3,true,yes,007,inf
        |""".stripMargin)
    val e = IntelIngest.toEntries(
      IntelIngest.readCsv(spark, dir.toString + "/feed.csv")).head
    assert(e.extra_types == Map(
      "ttl" -> "i32",   // i64 parse wins first
      "big" -> "u64",   // beyond i64, u64 catches it (2^64-1)
      "score" -> "f64",
      "exp" -> "f64",   // exponent form parses as f64
      "flag" -> "bool",
      "name" -> "str",  // "yes" is not a reference bool
      "lead" -> "i32",  // leading zeros parse ("007" -> 7)
      "inf" -> "str"))  // JSON-safety deviation: non-finite stays string
    // rendering applies the reference's truncating/canonical forms
    import graft.intel.DataValues
    assert(DataValues.renderJson("6442450944", "i32") == "-2147483648")
    assert(DataValues.renderJson("18446744073709551615", "u64") ==
      "18446744073709551615")
    assert(DataValues.renderJson("007", "i32") == "7")
    assert(DataValues.renderJson("1e3", "f64") == "1000.0")
    assert(DataValues.renderJson("yes", "str") == "\"yes\"")
    assert(DataValues.renderJson("a\"b\nc", "str") == "\"a\\\"b\\nc\"")
  }

  test("json feed: native JSON types are captured, numeric-looking " +
      "strings STAY strings (cli_utils.rs:213-243)") {
    val dir = Files.createTempDirectory("intel-json-typed")
    Files.writeString(dir.resolve("feed.json"),
      """[{"key": "bad.example", "data": {"threat_level": "high",
        |  "category": "c2", "source": "j", "confidence": 80,
        |  "ttl": 3600, "score": 0.5, "verified": true,
        |  "port": "0443"}}]
        |""".stripMargin)
    val e = IntelIngest.toEntries(
      IntelIngest.readJson(spark, dir.toString + "/feed.json")).head
    assert(e.extra == Map("ttl" -> "3600", "score" -> "0.5",
      "verified" -> "true", "port" -> "0443"))
    assert(e.extra_types == Map("ttl" -> "i32", "score" -> "f64",
      "verified" -> "bool", "port" -> "str"))
  }

  test("json feed: typing is per VALUE, not per column — a mixed-type " +
      "key gets each entry's own serde type (cli_utils.rs:213-243)") {
    val dir = Files.createTempDirectory("intel-json-mixed")
    // ttl: i64 in one entry, fractional in the next — Spark column
    // inference would widen BOTH to double ("2.0"); the reference types
    // each value (Int32(2) vs Double(2.5)). big: 2^64 exceeds u64::MAX →
    // as_f64 fallback, not a quoted string.
    Files.writeString(dir.resolve("feed.json"),
      """[{"key": "a.example", "data": {"threat_level": "high",
        |  "confidence": 80, "ttl": 2, "flag": true}},
        | {"key": "b.example", "data": {"threat_level": "low",
        |  "confidence": 70, "ttl": 2.5,
        |  "big": 18446744073709551616, "neg": -3}}]
        |""".stripMargin)
    val es = IntelIngest.toEntries(
      IntelIngest.readJson(spark, dir.toString + "/feed.json"))
      .sortBy(_.entry)
    val a = es.head
    assert(a.entry == "a.example" && a.confidence == 80)
    assert(a.extra == Map("ttl" -> "2", "flag" -> "true"), a.extra)
    assert(a.extra_types == Map("ttl" -> "i32", "flag" -> "bool"),
      a.extra_types)
    val b = es(1)
    assert(b.extra("ttl") == "2.5" && b.extra_types("ttl") == "f64")
    assert(b.extra_types("neg") == "i32" && b.extra("neg") == "-3")
    // 2^64 = 18446744073709551616 exceeds u64::MAX -> f64, rendered as a
    // JSON number (the reference's as_f64 fallback), never quoted
    assert(b.extra_types("big") == "f64", b.extra_types.toString)
    assert(graft.intel.DataValues
      .renderJson(b.extra("big"), "f64") == "1.8446744073709552E19")
  }

  test("json feed: NDJSON (one object per line) ingests EVERY record — " +
      "and an 'extra'-named feed column survives as a map key") {
    val dir = Files.createTempDirectory("intel-ndjson")
    // round-5 review find: the unconditional multiLine=true read parsed
    // each file as ONE json value, so an NDJSON feed yielded only its
    // first record and the scan silently missed every other indicator
    Files.writeString(dir.resolve("feed.json"),
      """{"key": "a.example", "data": {"threat_level": "high", "ttl": 1}}
        |{"key": "b.example", "data": {"threat_level": "low", "ttl": 2.5}}
        |{"key": "c.example", "data": {"threat_level": "medium"}}
        |""".stripMargin)
    val es = IntelIngest.toEntries(
      IntelIngest.readJson(spark, dir.toString + "/feed.json"))
      .sortBy(_.entry)
    assert(es.map(_.entry) == Seq("a.example", "b.example", "c.example"))
    // per-value typing works through the NDJSON path too
    assert(es.head.extra_types("ttl") == "i32" &&
      es(1).extra_types("ttl") == "f64")

    // a feed whose own column is literally NAMED "extra" (plain string)
    // must stringify into the extra map like any other dynamic column,
    // not crash the IntelEntry upcast (type-gated prebuilt check)
    val dir2 = Files.createTempDirectory("intel-extra-col")
    Files.writeString(dir2.resolve("feed.csv"),
      """entry,category,extra
        |evil.com,c2,custom-note
        |""".stripMargin)
    val e2 = IntelIngest.toEntries(
      IntelIngest.readCsv(spark, dir2.toString + "/feed.csv")).head
    assert(e2.extra == Map("extra" -> "custom-note"), e2.extra.toString)
  }

  test("text feed (S7): one entry per line, comments skipped") {
    val dir = Files.createTempDirectory("intel-text")
    Files.writeString(dir.resolve("feed.txt"),
      """# comment line
        |1.2.3.4
        |
        |malware.example.org
        |*.evil.net
        |""".stripMargin)
    val entries = IntelIngest.toEntries(
      IntelIngest.readText(spark, dir.toString + "/feed.txt"))
    assert(entries.map(_.entry).toSet ==
      Set("1.2.3.4", "malware.example.org", "*.evil.net"))
    assert(entries.forall(_.threat_level == "unknown"))
  }

  test("json feed: empty file and bare [] yield an empty normalized " +
    "frame, not a schema-inference crash (round-5 find)") {
    val dir = Files.createTempDirectory("intel-json-empty")
    Files.writeString(dir.resolve("empty.json"), "")
    val e1 = IntelIngest.toEntries(
      IntelIngest.readJson(spark, dir.toString + "/empty.json"))
    assert(e1.isEmpty)
    Files.writeString(dir.resolve("arr.json"), "[]")
    val e2 = IntelIngest.toEntries(
      IntelIngest.readJson(spark, dir.toString + "/arr.json"))
    assert(e2.isEmpty)
  }

}
