package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Anomaly — MAD-based robust outlier flags. */
class AnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("flags exactly the values with |dev| > k*MAD; medians are " +
    "nearest-rank data values") {
    // group a: values 1..9 plus outlier 100. n=10, median rank
    // (500*10+999)/1000 = 5 -> value 5.0 (sorted: 1..9,100).
    // devs: 4,3,2,1,0,1,2,3,4,95 -> sorted 0,1,1,2,2,3,3,4,4,95;
    // mad rank 5 -> 2.0; threshold 3*2=6 -> only 95 > 6 flagged.
    val a = (1 to 9).map(v => ("a", v.toDouble)) :+ (("a", 100.0))
    // group b: all equal -> mad 0 -> any nonzero dev flags; here none.
    val b = Seq.fill(4)(("b", 7.0))
    // group c: mad 0 with one departure -> that departure flags.
    val c = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0), ("c", 6.0))
    val df = (a ++ b ++ c).toDF("k", "v")
    val got = Anomaly.madOutliers(df, Seq("k"), "v")
      .select("k", "v", "group_median", "group_mad")
      .as[(String, Double, Double, Double)].collect().toSeq.sorted
    assert(got == Seq(("a", 100.0, 5.0, 2.0), ("c", 6.0, 5.0, 0.0)))
  }

  test("NULL measurements are excluded from both medians and never " +
    "flagged") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("a", Some(50.0))).toDF("k", "v")
    // n=4 (null excluded), median rank 2 -> 2.0; devs 1,0,1,48 ->
    // mad rank 2 -> 1.0; threshold 3 -> only 48 flagged
    val got = Anomaly.madOutliers(df, Seq("k"), "v")
      .select("v").as[Double].collect().toSeq
    assert(got == Seq(50.0))
  }

  test("one exchange: both median passes and the fan-back windows reuse " +
    "the group-key partitioning") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    val plan = Anomaly.madOutliers(df, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected ONE hash exchange, got $exchanges:\n" +
      plan.take(3000))
  }

  test("kPermille must be positive") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](
      Anomaly.madOutliers(df, Seq("k"), "v", kPermille = 0))
  }

  test("pre-existing output-named columns are rejected, not silently " +
    "replaced (review find)") {
    val df = Seq(("a", 1.0, 9.9)).toDF("k", "v", "abs_dev")
    val e = intercept[IllegalArgumentException](
      Anomaly.madOutliers(df, Seq("k"), "v"))
    assert(e.getMessage.contains("abs_dev"))
  }
}
