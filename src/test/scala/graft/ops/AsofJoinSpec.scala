package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** AsofJoin — most-recent-state-at-or-before temporal enrichment via the
  * union + carry-forward-window one-shuffle plan.
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def probe(rows: (Long, Long, Long)*) = // (event_id, key, sec)
    rows.toSeq.toDF("event_id", "k", "sec")
      .selectExpr("event_id", "k", "timestamp_seconds(sec) AS ts")

  private def build(rows: (Long, Long, Long, String)*) = // (id, key, sec, v)
    rows.toSeq.toDF("bid", "k", "sec", "v")
      .selectExpr("bid", "k", "timestamp_seconds(sec) AS ts", "v")

  private def join(p: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame) =
    AsofJoin.asofJoin(p, b, keys = Seq("k"), carry = Seq("bid", "v"),
      buildTie = "bid")
      .select("event_id", "bid", "v")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (e, b, v) => e -> ((b, v)) }.toMap

  test("picks the most recent build row at or before the probe ts, " +
    "per key; earlier probes get NULL") {
    val got = join(
      probe((1L, 7L, 5L), (2L, 7L, 15L), (3L, 7L, 25L), (4L, 8L, 15L)),
      build((100L, 7L, 10L, "a"), (101L, 7L, 20L, "b"),
        (102L, 8L, 10L, "x")))
    assert(got == Map(
      1L -> (None, None),              // before any state
      2L -> (Some(100L), Some("a")),   // 10 <= 15 < 20
      3L -> (Some(101L), Some("b")),   // latest
      4L -> (Some(102L), Some("x")))) // other key
  }

  test("a build row AT the probe's exact ts is visible (at-or-before), " +
    "and equal-ts build ties go to the largest tie column") {
    val got = join(
      probe((1L, 7L, 10L)),
      build((100L, 7L, 10L, "lo"), (101L, 7L, 10L, "hi")))
    assert(got == Map(1L -> (Some(101L), Some("hi"))))
  }

  test("keys never match through NULL (SQL equi-join semantics): " +
    "NULL-key build rows are dropped, NULL-key probes keep NULL payload") {
    val p = Seq((1L, Option.empty[Long], 20L), (2L, Some(7L), 20L))
      .toDF("event_id", "k", "sec")
      .selectExpr("event_id", "k", "timestamp_seconds(sec) AS ts")
    val b = Seq((100L, Option.empty[Long], 10L, "null-key"),
      (101L, Some(7L), 10L, "real"))
      .toDF("bid", "k", "sec", "v")
      .selectExpr("bid", "k", "timestamp_seconds(sec) AS ts", "v")
    val got = AsofJoin.asofJoin(p, b, Seq("k"), Seq("bid", "v"),
      buildTie = "bid")
      .select("event_id", "bid", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(got == Set((1L, None, None), (2L, Some(101L), Some("real"))))
  }

  test("NULL-ts build rows match nothing; NULL-ts probes get NULL " +
    "payload (never 'before everything sees latest state')") {
    val p = Seq((1L, 7L, Some(20L)), (2L, 7L, Option.empty[Long]))
      .toDF("event_id", "k", "sec")
      .selectExpr("event_id", "k", "timestamp_seconds(sec) AS ts")
    val b = Seq((100L, 7L, Some(10L), "real"),
      (101L, 7L, Option.empty[Long], "null-ts"))
      .toDF("bid", "k", "sec", "v")
      .selectExpr("bid", "k", "timestamp_seconds(sec) AS ts", "v")
    val got = AsofJoin.asofJoin(p, b, Seq("k"), Seq("bid", "v"),
      buildTie = "bid")
      .select("event_id", "bid", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(got == Set((1L, Some(100L), Some("real")), (2L, None, None)))
  }

  test("multi-column payload is atomic: a NULL field in the winning " +
    "build row stays NULL, never stitched from an older row") {
    val b = Seq((100L, 7L, 10L, Some("old")),
      (101L, 7L, 20L, Option.empty[String]))
      .toDF("bid", "k", "sec", "v")
      .selectExpr("bid", "k", "timestamp_seconds(sec) AS ts", "v")
    val got = AsofJoin.asofJoin(probe((1L, 7L, 30L)), b, Seq("k"),
      Seq("bid", "v"), buildTie = "bid")
      .select("event_id", "bid", "v")
      .as[(Long, Option[Long], Option[String])].collect().toSet
    assert(got == Set((1L, Some(101L), None)))
  }

  test("probe columns pass through untouched; carried-name collisions " +
    "and missing carry are rejected loudly") {
    val out = AsofJoin.asofJoin(
      probe((1L, 7L, 15L)).withColumn("payload",
        org.apache.spark.sql.functions.lit("keep")),
      build((100L, 7L, 10L, "a")), Seq("k"), Seq("v"), buildTie = "bid")
    assert(out.columns.toSeq ==
      Seq("event_id", "k", "ts", "payload", "v"))
    assert(out.select("payload").as[String].collect().toSeq == Seq("keep"))
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(probe((1L, 7L, 15L)),
        build((100L, 7L, 10L, "a")), Seq("k"), Seq("ts"), buildTie = "bid")
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(probe((1L, 7L, 15L)),
        build((100L, 7L, 10L, "a")), Seq("k"), Nil, buildTie = "bid")
    }
  }

  test("ONE hash exchange total: the union sorts once per key and no " +
    "join operator appears in the plan") {
    // range-based inputs so ConvertToLocalRelation cannot fold the plan
    import org.apache.spark.sql.functions._
    val p = spark.range(1000).toDF("event_id")
      .withColumn("k", pmod(col("event_id"), lit(13)))
      .withColumn("ts", timestamp_seconds(col("event_id") * 7))
    val b = spark.range(100).toDF("bid")
      .withColumn("k", pmod(col("bid"), lit(13)))
      .withColumn("ts", timestamp_seconds(col("bid") * 31))
      .withColumn("v", concat(lit("s"), col("bid")))
    val plan = AsofJoin.asofJoin(p, b, Seq("k"), Seq("bid", "v"),
      buildTie = "bid").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected ONE hash exchange, got $exchanges:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), s"unexpected join operator:\n$plan")
  }
}
