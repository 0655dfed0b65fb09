package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Anonymize — deterministic pseudonyms + collision accounting. */
class AnonymizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("deterministic, salt-sensitive, NULL-preserving") {
    val df = Seq(Some(1L), Some(1L), Some(2L), None)
      .toDF("id")
    val p = Anonymize.pseudonymize(df, "id", "s1")
      .select("pseudo_id").as[Option[String]].collect().toSeq
    assert(p(0).get == p(1).get && p(0).get != p(2).get)
    assert(p(0).get.length == 16 && p(3).isEmpty)
    val p2 = Anonymize.pseudonymize(df, "id", "OTHER")
      .select("pseudo_id").as[Option[String]].collect().toSeq
    assert(p2(0).get != p(0).get, "salt must change the pseudonym")
  }

  test("pseudonym equals the md5-prefix construction exactly") {
    val want = spark.sql("SELECT substring(md5('s1:42'), 1, 16) AS x")
      .as[String].collect()(0)
    val real = Anonymize.pseudonymize(Seq(42L).toDF("id"), "id", "s1")
      .select("pseudo_id").as[String].collect()(0)
    assert(real == want)
  }

  test("collision audit: zero at full width, positive when truncated " +
    "below the id cardinality") {
    val df = (1L to 300L).toDF("id")
    val full = Anonymize.collisionAudit(df, "id", "s1", hexLen = 16)
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(full == ((300L, 300L, 300L, 0L)))
    // 1 hex char = 16 buckets for 300 ids: collisions guaranteed
    val tight = Anonymize.collisionAudit(df, "id", "s1", hexLen = 1)
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(tight._3 <= 16L && tight._4 == tight._2 - tight._3 &&
      tight._4 > 0L)
  }

  test("NULL ids count no identity and no pseudonym") {
    val df = Seq(Some(1L), None, None).toDF("id")
    val a = Anonymize.collisionAudit(df, "id", "s1")
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(a == ((3L, 1L, 1L, 0L)))
  }

  test("hexLen bounds are enforced") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Anonymize.pseudonymize(df, "id", "s", hexLen = 0)
    }
    intercept[IllegalArgumentException] {
      Anonymize.collisionAudit(df, "id", "s", hexLen = 33)
    }
  }
}
