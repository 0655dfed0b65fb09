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
}
