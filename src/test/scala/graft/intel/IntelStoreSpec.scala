package graft.intel

import graft.SparkTestBase
import graft.pipeline.Fixtures
import graft.sources.MispIngest
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class IntelStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("S9 analog: save/load round-trips the compiled database") {
    val db = IntelDb.build("threats", Fixtures.intelThreats)
    val path = Files.createTempDirectory("intel-store").toString + "/db"
    IntelStore.save(spark, db, path)
    val loaded = IntelStore.load(spark, path)
    assert(loaded.databaseId == "threats")
    assert(loaded.entries.map(_.entry).toSeq == db.entries.map(_.entry).toSeq)
    // behavior round-trips
    assert(loaded.lookupIp("192.0.2.1", isV6 = false) ==
      db.lookupIp("192.0.2.1", isV6 = false))
    assert(loaded.lookupString("host1.evil-glob.net").toSeq ==
      db.lookupString("host1.evil-glob.net").toSeq)
  }

  test("empty feed round-trips (reference builds/opens empty dbs fine)") {
    val db = IntelDb.build("empty-feed", Nil, caseInsensitive = true)
    val path = Files.createTempDirectory("intel-store-e").toString + "/db"
    IntelStore.save(spark, db, path)
    val loaded = IntelStore.load(spark, path)
    assert(loaded.databaseId == "empty-feed")
    assert(loaded.caseInsensitive)
    assert(loaded.entries.isEmpty)
    assert(loaded.lookupString("anything").isEmpty)
    assert(loaded.lookupIp("1.2.3.4", isV6 = false) == null)
  }

  test("S12: point query dispatches ip vs string and reports NotFound") {
    val db = IntelDb.build("threats", Fixtures.intelThreats)
    val ipHit = QueryApi.query(db, "192.0.2.77")
    assert(ipHit.size == 1 && ipHit.head.matchType == "ip" &&
      ipHit.head.prefixLen == 24)
    val strHit = QueryApi.query(db, "evil-domain.com")
    assert(strHit.nonEmpty && strHit.head.matchType == "pattern")
    assert(QueryApi.query(db, "nothing-here.example").isEmpty)
    // multi-db
    val dbs = Seq(db, IntelDb.build("allowlist", Fixtures.intelAllowlist))
    val multi = QueryApi.query(dbs, "10.10.99.5")
    assert(multi.map(_.databaseId).toSet == Set("threats", "allowlist"))
  }

  test("S8: MISP JSON attribute mapping") {
    val json =
      """{"Event": {
        |  "info": "campaign-x", "threat_level_id": "1",
        |  "Attribute": [
        |    {"type": "ip-src", "value": "192.0.2.7", "category": "Network activity"},
        |    {"type": "ip-dst|port", "value": "198.51.100.2|443", "category": "Network activity"},
        |    {"type": "domain", "value": "evil.example.com", "category": "Network activity"},
        |    {"type": "domain|ip", "value": "bad.example.org|203.0.113.9", "category": "Network activity"},
        |    {"type": "url", "value": "https://mal.example.net/path?q=1", "category": "Payload delivery"},
        |    {"type": "md5", "value": "5d41402abc4b2a76b9719d911017c592", "category": "Payload delivery"},
        |    {"type": "filename|sha256", "value": "dropper.exe|e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855", "category": "Payload delivery"},
        |    {"type": "email-src", "value": "phish@evil.example.com", "category": "Payload delivery"},
        |    {"type": "comment", "value": "not an indicator", "category": "Other"}
        |  ],
        |  "Object": [
        |    {"Attribute": [
        |      {"type": "ip-src/netmask", "value": "10.9.0.0/16", "category": "Network activity"}
        |    ]}
        |  ]
        |}}""".stripMargin
    val entries = MispIngest.parse(json)
    val values = entries.map(_.entry).toSet
    assert(values == Set(
      "192.0.2.7", "198.51.100.2", "evil.example.com", "bad.example.org",
      "203.0.113.9", "mal.example.net", "https://mal.example.net/path?q=1",
      "5d41402abc4b2a76b9719d911017c592", "dropper.exe",
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
      "phish@evil.example.com", "10.9.0.0/16"))
    assert(entries.forall(_.threat_level == "high"))
    assert(entries.forall(_.source == "campaign-x"))
    // builds into a working db
    val db = IntelDb.build("misp", entries)
    assert(db.lookupIp("10.9.1.2", isV6 = false) != null)
    assert(db.lookupString("evil.example.com").nonEmpty)
  }

  test("prescreen: identical matched output, rejects clean turns") {
    val dbs = Seq(
      IntelDb.build("threats", Fixtures.intelThreats),
      IntelDb.build("allowlist", Fixtures.intelAllowlist))
    val screen = CleanPreScreen.build(dbs)
    // soundness on the fixture: every matching turn passes the screen
    val turns = Fixtures.turns(3000)
    val matchedKeys = graft.oracle.Oracle.matched(turns, dbs)
      .map(m => (m.conv_id, m.turn_idx)).toSet
    turns.foreach { t =>
      val passes = screen.mightMatch(t.text.getBytes("UTF-8"))
      if (matchedKeys((t.conv_id, t.turn_idx)))
        assert(passes, s"prescreen dropped a matching turn: ${t.text}")
    }
    // and it actually rejects something
    val rejected = turns.count(t => !screen.mightMatch(t.text.getBytes("UTF-8")))
    assert(rejected > 0)
    // Spark-side equality
    val df = spark.createDataFrame(turns)
    val base = graft.pipeline.ScanJob.matched(df, dbs, spark)
      .drop("cidr").collect().toSet
    val pre = graft.pipeline.ScanJob.matched(df, dbs, spark, prescreen = true)
      .drop("cidr").collect().toSet
    assert(base == pre)
  }
}
