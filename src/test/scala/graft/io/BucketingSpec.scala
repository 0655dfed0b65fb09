package graft.io

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the write-once / join-forever layout: co-bucketed joins
  * must plan with zero Exchange and return the plain-join result. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val fact = (0 until 5000)
    .map(i => (i.toLong % 97, i.toLong)).toDF("user_id", "event_id")
  private lazy val dim = (0L until 97L)
    .map(u => (u, s"tier${u % 3}")).toDF("user_id", "tier")

  test("co-bucketed join: zero Exchange, plain-join result") {
    Bucketing.writeBucketed(fact, "graft_bspec_fact", "user_id", 8,
      sortCols = Seq("user_id"))
    Bucketing.writeBucketed(dim, "graft_bspec_dim", "user_id", 8,
      sortCols = Seq("user_id"))
    try {
      val joined = Bucketing.bucketedJoin(spark, "graft_bspec_fact",
        "graft_bspec_dim", Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      val got = joined.groupBy("tier").count()
        .as[(String, Long)].collect().sortBy(_._1).toSeq
      val want = fact.join(dim, Seq("user_id")).groupBy("tier").count()
        .as[(String, Long)].collect().sortBy(_._1).toSeq
      assert(got == want && got.map(_._2).sum == 5000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bspec_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bspec_dim")
    }
  }

  test("aggregation on the bucket key is also exchange-free") {
    Bucketing.writeBucketed(fact, "graft_bspec_agg", "user_id", 8)
    try {
      val agg = spark.table("graft_bspec_agg").groupBy("user_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(agg.count() == 97L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bspec_agg")
  }

  test("mismatched bucket counts fall back to a shuffle (documented)") {
    Bucketing.writeBucketed(fact, "graft_bspec_f8", "user_id", 8)
    Bucketing.writeBucketed(dim, "graft_bspec_d4", "user_id", 4)
    try {
      val plan = Bucketing.bucketedJoin(spark, "graft_bspec_f8",
        "graft_bspec_d4", Seq("user_id"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bspec_f8")
      spark.sql("DROP TABLE IF EXISTS graft_bspec_d4")
    }
  }
}
