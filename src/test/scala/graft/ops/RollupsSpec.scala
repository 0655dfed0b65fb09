package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rollups — expand-free distinct rollup + aggregate-then-rank top-k. */
class RollupsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("distinctRollup matches the naive count_distinct form, " +
    "including NULL entities (counted in n_rows/sums, not n_distinct)") {
    val df = Seq(
      ("a", Some(1L), 10L), ("a", Some(1L), 20L), ("a", Some(2L), 5L),
      ("a", None, 7L), ("b", Some(1L), 1L), ("b", None, 2L),
      ("b", None, 3L)).toDF("g", "u", "cents")
    val got = Rollups.distinctRollup(df, keys = Seq(col("g")),
      entityCol = col("u"), distinctName = "n_users",
      innerAggs = Seq(sum("cents").as("cents")),
      outerAggs = Seq(sum("cents").as("cents")))
      .as[(String, Long, Long, Long)].collect().toSet
    val naive = df.groupBy("g")
      .agg(countDistinct(col("u")).as("n_users"),
        count(lit(1)).as("n_rows"), sum("cents").as("cents"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set(("a", 2L, 4L, 42L), ("b", 1L, 3L, 6L)))
  }

  test("plan shape: two exchanges, NO Expand, even with distribution " +
    "aggregates riding along (Catalyst Expands only on >=2 DISTINCT " +
    "groups — which is the trap this op's one-pass shape avoids)") {
    val df = spark.range(1000).toDF("id")
      .withColumn("g", pmod(col("id"), lit(7)))
      .withColumn("u", pmod(col("id"), lit(13)))
      .withColumn("cents", col("id") % 100)
    val rollup = Rollups.distinctRollup(df, Seq(col("g")), col("u"),
      innerAggs = Seq(sum("cents").as("cents")),
      outerAggs = Seq(sum("cents").as("cents"),
        max("cents").as("max_entity_cents"),
        max("entity_rows").as("max_entity_rows")))
    val plan = rollup.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"unexpected Expand:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2,
      s"expected TWO hash exchanges, got $exchanges:\n${plan.take(3000)}")
    // Catalyst itself handles ONE distinct group without Expand (so the
    // doc's claim stays honest if this ever changes) ...
    val oneDistinct = df.groupBy("g")
      .agg(countDistinct(col("u")), count(lit(1)), sum("cents"))
      .queryExecution.executedPlan.toString
    assert(!oneDistinct.contains("Expand"), oneDistinct)
    // ... and two distinct groups is where the flat form Expands.
    val twoDistinct = df.groupBy("g")
      .agg(countDistinct(col("u")), countDistinct(col("cents")))
      .queryExecution.executedPlan.toString
    assert(twoDistinct.contains("Expand"), twoDistinct)
    // the distribution aggregates agree with the subquery formulation
    val viaSubquery = df.groupBy("g", "u")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .groupBy("g").agg(max("c").as("mc"), max("n").as("mn"))
      .as[(Long, Long, Long)].collect().toSet
    val gotDist = rollup
      .select("g", "max_entity_cents", "max_entity_rows")
      .as[(Long, Long, Long)].collect().toSet
    assert(gotDist == viaSubquery)
  }

  test("topKPerGroup: k per group by metric desc, ties to the " +
    "smallest entity id; groups smaller than k emit what they have") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 5L),
      ("b", 9L, 1L)).toDF("g", "u", "cents")
    val got = Rollups.topKPerGroup(df, Seq("g"), "u",
      sum("cents"), k = 2)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got == Set(
      ("a", 2L, 30L, 1), ("a", 3L, 30L, 2), // tie -> smaller id first
      ("b", 9L, 1L, 1)))
  }

  test("topKPerGroup ranks over the AGGREGATE, not raw rows: one " +
    "row per entity even when its events outnumber k") {
    val df = Seq.tabulate(20)(i => ("g", 1L, 1L)) :+ (("g", 2L, 100L))
    val got = Rollups.topKPerGroup(df.toDF("g", "u", "cents"),
      Seq("g"), "u", sum("cents"), k = 2)
      .as[(String, Long, Long, Int)].collect().toSet
    assert(got == Set(("g", 2L, 100L, 1), ("g", 1L, 20L, 2)))
  }
}
