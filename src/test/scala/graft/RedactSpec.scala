package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RedactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def redact(text: String): String =
    Seq(text).toDF("t")
      .select(GraftFunctions.redact_iocs(col("t")).as("r"))
      .as[String].head()

  test("typed placeholders replace each family's span; prose survives") {
    assert(redact("peer 10.1.2.3 contacted evil.com today") ==
      "peer [REDACTED:ipv4] contacted [REDACTED:domain] today")
    assert(redact("hash 5d41402abc4b2a76b9719d911017c592 seen") ==
      "hash [REDACTED:md5] seen")
    assert(redact("v6 2001:db8::1 done") == "v6 [REDACTED:ipv6] done")
  }

  test("email/email-domain overlap collapses to ONE email placeholder") {
    assert(redact("mail alice@evil.com now") ==
      "mail [REDACTED:email] now")
  }

  test("strict-grammar rejects survive verbatim") {
    assert(redact("from 999.1.2.3 and 192.168.01.7 nothing") ==
      "from 999.1.2.3 and 192.168.01.7 nothing")
  }

  test("no candidates / empty / null pass through") {
    assert(redact("just some plain words") == "just some plain words")
    assert(redact("") == "")
    val r = Seq[String](null).toDF("t")
      .select(GraftFunctions.redact_iocs(col("t")).as("r"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("byte-exact splice around multi-byte UTF-8") {
    assert(redact("été 10.1.2.3 漢字テスト 8.8.8.8 😀") ==
      "été [REDACTED:ipv4] 漢字テスト [REDACTED:ipv4] 😀")
  }

  test("adjacent spans both redact; varying value lengths splice correctly") {
    assert(redact("10.1.2.3 10.200.250.99") ==
      "[REDACTED:ipv4] [REDACTED:ipv4]")
  }

  test("registered SQL function form works") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT redact_iocs('ping 10.1.2.3') AS r").as[String].head()
    assert(out == "ping [REDACTED:ipv4]")
  }
}
