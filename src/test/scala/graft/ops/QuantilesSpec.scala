package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Quantiles — two-pass bucket refinement must be bit-identical to the
  * direct full-sort nearest-rank form at every width. */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val ps = Seq(("50", 500), ("90", 900), ("99", 990))

  private def direct(df: DataFrame) =
    Percentiles.nearestRank(df, Seq("k"), "v", ps)
      .orderBy("k").collect().toSeq

  private def bucketed(df: DataFrame, w: Long) =
    Quantiles.bucketedNearestRank(df, Seq("k"), "v", ps, w)
      .orderBy("k").collect().toSeq

  private def corpus(seed: Int, n: Int): DataFrame =
    (0 until n).map { i =>
      val h = (i * 2654435761L + seed * 97L) & 0xffffffffL
      (s"g${h % 5}", (h % 10007L) - 2000L) // negatives included
    }.toDF("k", "v")

  test("equivalence with the direct form across widths, incl. the " +
    "width-1 exact histogram and the one-bucket degenerate") {
    val df = corpus(1, 4000)
    val want = direct(df)
    for (w <- Seq(1L, 7L, 100L, 4096L, 1000000000L))
      assert(bucketed(df, w) == want, s"width=$w")
  }

  test("negative values: truncating div buckets stay monotone and the " +
    "picked values match the direct sort") {
    val df = Seq(("a", -7L), ("a", -3L), ("a", -1L), ("a", 0L),
      ("a", 1L), ("a", 3L), ("a", 8L)).toDF("k", "v")
    for (w <- Seq(2L, 3L, 5L)) assert(bucketed(df, w) == direct(df))
  }

  test("ties at a rank boundary pick the identical value") {
    // 10 rows, p90 rank = ceil(0.9*10) = 9; rows 8..10 all equal 5
    val df = (Seq.fill(7)(1L) ++ Seq.fill(3)(5L)).map(("t", _))
      .toDF("k", "v")
    assert(bucketed(df, 2L) == direct(df))
  }

  test("NULL measurements are excluded from n (rank denominators agree)") {
    val df = (Seq[java.lang.Long](1L, 2L, 3L, 4L, null, null)
      .map(v => ("n", v))).toDF("k", "v")
    assert(bucketed(df, 3L) == direct(df))
  }

  test("multiple percentiles landing in the same bucket both resolve") {
    // width large enough that p50/p90/p99 straddle one bucket
    val df = (1L to 100L).map(("one", _)).toDF("k", "v")
    assert(bucketed(df, 1000L) == direct(df))
    // and small enough that they straddle three different buckets
    assert(bucketed(df, 10L) == direct(df))
  }

  test("rangeBoundaries: exact nearest-rank values at i*1000/k, " +
    "non-decreasing, matching the direct form") {
    val df = corpus(3, 2000).withColumn("g",
      org.apache.spark.sql.functions.lit("all"))
    val bounds = Quantiles.rangeBoundaries(df, "v", 8, 50L)
      .orderBy("boundary_idx")
      .as[(Int, Int, Long)].collect().toSeq
    assert(bounds.map(_._1) == (1 to 7) &&
      bounds.map(_._2) == Seq(125, 250, 375, 500, 625, 750, 875))
    assert(bounds.map(_._3) == bounds.map(_._3).sorted)
    val direct = Percentiles.nearestRank(df, Seq("g"), "v",
      bounds.map(b => (b._1.toString, b._2))).collect()(0)
    assert((1 to 7).map(i => direct.getLong(i)) == bounds.map(_._3))
  }

  test("rangeBoundaries: a dominant value yields equal boundaries " +
    "(the honest fat-range answer) and k bounds are enforced") {
    val df = (Seq.fill(900)(5L) ++ (1L to 100L)).map(("x", _))
      .toDF("k", "v")
    val b = Quantiles.rangeBoundaries(df, "v", 4, 10L)
      .orderBy("boundary_idx").as[(Int, Int, Long)].collect().toSeq
    assert(b.count(_._3 == 5L) >= 2)
    intercept[IllegalArgumentException] {
      Quantiles.rangeBoundaries(df, "v", 1, 10L)
    }
  }

  test("a NULL group key is a real group in BOTH passes (the pass-2 " +
    "join must be null-safe, or the group silently vanishes)") {
    val df = Seq((Option("a"), 1L), (Option("a"), 9L),
      (Option.empty[String], 10L), (Option.empty[String], 30L),
      (Option.empty[String], 20L)).toDF("k", "v")
    val got = Quantiles.bucketedNearestRank(df, Seq("k"), "v", ps, 5L)
      .orderBy("k").collect().toSeq
    assert(got.size == 2 && got.exists(_.isNullAt(0)))
    val nullRow = got.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 20L && nullRow.getLong(3) == 30L)
    val w = Quantiles.bucketedWeightedNearestRank(
      df.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
      Seq("k"), "v", "w", ps, 5L).orderBy("k").collect().toSeq
    assert(w.map(_.toSeq) == got.map(_.toSeq))
  }

  test("weighted: unit weights reproduce the unweighted form exactly " +
    "across widths") {
    val df = corpus(7, 3000)
      .withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val want = direct(df)
    for (wd <- Seq(1L, 13L, 500L, 1000000000L)) {
      val got = Quantiles.bucketedWeightedNearestRank(
        df, Seq("k"), "v", "w", ps, wd)
        .orderBy("k").collect().toSeq
      assert(got.map(_.toSeq) == want.map(_.toSeq), s"width=$wd")
    }
  }

  test("weighted: crossing-row rule matches a brute-force replay; " +
    "zero weights inert; null weights excluded; negative raises") {
    val rows = (0 until 600).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      (s"g${h % 3}", (h % 997L), // value
        if (h % 13 == 0) Option.empty[Long]
        else Some(h % 7L)) // weights 0..6, some null
    }
    val df = rows.toDF("k", "v", "w")
    def brute(p: Int): Map[String, Long] =
      rows.groupBy(_._1).map { case (k, rs) =>
        val vw = rs.flatMap(r => r._3.map(w => (r._2, w)))
          .sortBy(_._1)
        val tot = vw.map(_._2).sum
        val r = (p * tot + 999) / 1000
        var cum = 0L
        val crossing = vw.find { case (_, w) =>
          cum += w; cum >= r && cum - w < r
        }.get._1
        (k, crossing)
      }
    for (wd <- Seq(1L, 50L, 1000000000L)) {
      val got = Quantiles.bucketedWeightedNearestRank(
        df, Seq("k"), "v", "w", ps, wd)
        .orderBy("k").collect()
        .map(r => (r.getString(0), (1 to 3).map(r.getLong))).toMap
      ps.map(_._2).zipWithIndex.foreach { case (p, i) =>
        val want = brute(p)
        got.foreach { case (k, vals) =>
          assert(vals(i) == want(k), s"p=$p k=$k width=$wd") }
      }
    }
    val neg = Seq(("a", 1L, -2L)).toDF("k", "v", "w")
    val e = intercept[Exception] {
      Quantiles.bucketedWeightedNearestRank(
        neg, Seq("k"), "v", "w", ps, 10L).collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      Option(e.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("assignRanges: boundary rule v<=b1 | b_i<v<=b_i+1 | v>b_k-1, " +
    "fat-value equal boundaries leave middle ranges empty, nulls get " +
    "null, unsorted boundaries rejected") {
    val df = Seq(Some(1L), Some(5L), Some(6L), Some(10L), Some(11L), None)
      .toDF("v")
    val got = Quantiles.assignRanges(df, "v", Seq(5L, 5L, 10L))
      .select("v", "range_idx")
      .as[(Option[Long], Option[Int])].collect().toMap
    assert(got(Some(1L)) == Some(0)) // v <= b1
    assert(got(Some(5L)) == Some(0)) // fat value: lowest matching range
    assert(got(Some(6L)) == Some(2)) // range 1 (between equal bs) empty
    assert(got(Some(10L)) == Some(2))
    assert(got(Some(11L)) == Some(3)) // v > b_(k-1)
    assert(got(None).isEmpty)
    intercept[IllegalArgumentException] {
      Quantiles.assignRanges(df, "v", Seq(10L, 5L))
    }
  }

  test("assignRanges over rangeBoundaries yields near-equal ranges and " +
    "adds no exchange (pure map-side application)") {
    val df = corpus(5, 3000)
    val bounds = Quantiles.rangeBoundaries(df, "v", 8, 50L)
      .orderBy("boundary_idx").select("value")
      .as[Long].collect().toSeq
    val assigned = Quantiles.assignRanges(df, "v", bounds)
    val sizes = assigned.groupBy("range_idx").count()
      .as[(Int, Long)].collect().toMap
    // nearest-rank boundaries: each of the 8 ranges holds ~3000/8 rows
    assert(sizes.keySet == (0 to 7).toSet)
    assert(sizes.values.forall(n => n >= 300 && n <= 450), sizes)
    // the assignment itself is shuffle-free
    val plan = Quantiles.assignRanges(df, "v", bounds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("non-integral value column is rejected loudly") {
    val df = Seq(("a", 1.5)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Quantiles.bucketedNearestRank(df, Seq("k"), "v", ps, 10L)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("pass-2 pruning: only straddling buckets reach the sort") {
    // observable via the needed-bucket arithmetic: with width 1 on a
    // uniform 1..1000 corpus the three percentiles select exactly the
    // three single-value buckets, so the picked frame has 3 rows/group
    val df = (1L to 1000L).map(("u", _)).toDF("k", "v")
    val out = Quantiles.bucketedNearestRank(df, Seq("k"), "v", ps, 1L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 500L && out(0).getLong(2) == 900L &&
      out(0).getLong(3) == 990L)
  }
}
