package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** LogTemplates — signature-partitioned wildcard template mining. */
class LogTemplatesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def mine(msgs: Seq[Option[String]]) =
    LogTemplates.mine(msgs.toDF("m"), col("m"))
      .as[(Int, String, String, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("varying positions wildcard, constant positions stay literal, " +
    "counts are per message") {
    val got = mine(Seq(
      Some("api request user=1 status=200"),
      Some("api request user=2 status=200"),
      Some("api request user=3 status=200"),
      Some("api heartbeat ok"),
      Some("db heartbeat ok")))
    assert(got == Map(
      (4, "api") -> (("api request <*> status=200", 3L)),
      (3, "api") -> (("api heartbeat ok", 1L)),
      (3, "db") -> (("db heartbeat ok", 1L))))
  }

  test("same first token, different lengths = different signatures " +
    "(no cross-length stitching)") {
    val got = mine(Seq(Some("api a b"), Some("api a b c")))
    assert(got == Map(
      (3, "api") -> (("api a b", 1L)),
      (4, "api") -> (("api a b c", 1L))))
  }

  test("a position constant within one signature but varying in " +
    "another stays literal where it is constant") {
    val got = mine(Seq(
      Some("svc x fixed"), Some("svc y fixed"),
      Some("db x fixed"), Some("db x varies")))
    assert(got((3, "svc")) == (("svc <*> fixed", 2L)))
    assert(got((3, "db")) == (("db x <*>", 2L)))
  }

  test("NULL messages drop; empty message is the 1-token empty template") {
    val got = mine(Seq(None, Some(""), Some("")))
    assert(got == Map((1, "") -> (("", 2L))))
  }

  test("single message mines itself verbatim") {
    val got = mine(Seq(Some("one exact line")))
    assert(got == Map((3, "one") -> (("one exact line", 1L))))
  }
}
