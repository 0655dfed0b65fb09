package graft

import java.nio.file.Files

import graft.extract.ScanConfig
import org.scalatest.funsuite.AnyFunSuite

/** The `matchy extract` CLI analog: type-flag parsing + end-to-end dump
  * over a text file (extract_cmd.rs semantics: line-per-record input,
  * json/csv/text output, --unique value dedup).
  */
class ExtractMainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("configFor: default all-on; --types whitelists; unknown rejected") {
    assert(ExtractMain.configFor(None, 2, boundaries = true) == ScanConfig())
    val c = ExtractMain.configFor(Some("ipv4,domain"), 3, boundaries = false)
    assert(c.ipv4 && c.domains)
    assert(!c.ipv6 && !c.emails && !c.hashes && !c.bitcoin && !c.ethereum &&
      !c.monero)
    assert(c.minDomainLabels == 3 && !c.requireWordBoundaries)
    intercept[IllegalArgumentException] {
      ExtractMain.configFor(Some("ipv4,frogs"), 2, boundaries = true)
    }
  }

  test("run: text-file input, json output, --unique dedups on value") {
    val in = Files.createTempFile("extract-in", ".log")
    Files.writeString(in,
      "conn from 10.1.2.3 to evil.com\n" +
        "again 10.1.2.3 plus mail a@b.com\n")
    val out = Files.createTempDirectory("extract-out").toString
    ExtractMain.run(spark, in.toString, out, "json", unique = true,
      ScanConfig())
    val lines = spark.read.text(out).collect().map(_.getString(0)).sorted
    // unique on value: 10.1.2.3 appears once despite two occurrences
    assert(lines.count(_.contains("10.1.2.3")) == 1)
    assert(lines.exists(l =>
      l.contains(""""type":"domain"""") && l.contains("evil.com")))
    assert(lines.exists(l =>
      l.contains(""""type":"email"""") && l.contains("a@b.com")))
  }

  test("run: type whitelist drops other indicator classes") {
    val in = Files.createTempFile("extract-in2", ".log")
    Files.writeString(in, "10.9.9.9 and evil.com and c@d.com\n")
    val out = Files.createTempDirectory("extract-out2").toString
    ExtractMain.run(spark, in.toString, out, "text", unique = false,
      ExtractMain.configFor(Some("ipv4"), 2, boundaries = true))
    val values = spark.read.text(out).collect().map(_.getString(0)).toSeq
    assert(values == Seq("10.9.9.9"))
  }
}
