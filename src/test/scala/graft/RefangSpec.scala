package graft

import graft.functions.{GraftFunctions, RefangText}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class RefangSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def refang(s: String): String =
    RefangText.refang(UTF8String.fromString(s)).toString

  test("dot forms") {
    assert(refang("evil[.]com") == "evil.com")
    assert(refang("evil(.)com") == "evil.com")
    assert(refang("evil{.}com") == "evil.com")
    assert(refang("evil[dot]com") == "evil.com")
    assert(refang("evil(DOT)com") == "evil.com")
    assert(refang("10[.]1[.]2[.]3") == "10.1.2.3")
  }

  test("at forms") {
    assert(refang("bob[at]x.org") == "bob@x.org")
    assert(refang("bob(at)x.org") == "bob@x.org")
    assert(refang("bob[@]x.org") == "bob@x.org")
  }

  test("scheme and colon forms") {
    assert(refang("hxxp://e.com") == "http://e.com")
    assert(refang("hXXps://e.com") == "https://e.com")
    assert(refang("HXXP[://]e[.]com") == "http://e.com")
    assert(refang("e.com[:]8080") == "e.com:8080")
  }

  test("non-defanged text is returned as the SAME object (zero-alloc)") {
    val u = UTF8String.fromString("plain text with [x] and (y) and h words")
    assert(RefangText.refang(u) eq u)
    assert(refang("[.x] (a.t) {..} hxp") == "[.x] (a.t) {..} hxp")
  }

  test("multi-byte UTF-8 around replacements splices byte-exact") {
    assert(refang("été evil[.]com 漢字") == "été evil.com 漢字")
  }

  test("composition: extract_iocs(refang_text(text)) finds the live IoCs") {
    val out = Seq("see hxxp://mal3[.]example[.]com and 10[.]1[.]2[.]3 " +
      "mail bob(at)mail2[dot]org")
      .toDF("t")
      .select(explode(GraftFunctions.extract_iocs(
        GraftFunctions.refang_text(col("t")))).as("ioc"))
      .select("ioc.indicator_type", "ioc.value")
      .as[(String, String)].collect().toSet
    assert(out == Set(
      ("domain", "mal3.example.com"),
      ("ipv4", "10.1.2.3"),
      ("email", "bob@mail2.org"),
      ("domain", "mail2.org"))) // email-domain double extraction
  }

  test("registered SQL function form works") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT refang_text('a[.]b') AS r").as[String].head()
      == "a.b")
  }
}
