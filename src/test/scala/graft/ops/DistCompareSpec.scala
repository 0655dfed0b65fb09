package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** DistCompare — exact TVD vs hand math, absence as signal, loud
  * empty-slice failure. */
class DistCompareSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tvd(a: Seq[Option[String]], b: Seq[Option[String]]) =
    DistCompare.categoricalTvd(a.toDF("k"), b.toDF("k"), col("k"))
      .select("n_a", "n_b", "n_keys", "n_keys_only_a", "n_keys_only_b",
        "tvd_num", "tvd_den", "tvd_permille")
      .as[(BigDecimal, BigDecimal, Long, Long, Long, BigDecimal,
        BigDecimal, Long)].head()

  test("hand-computed TVD: identical -> 0, disjoint -> 1, mixed exact; " +
    "NULL is a real category") {
    val same = Seq(Some("x"), Some("x"), None)
    assert(tvd(same, same)._8 == 0L)
    val d = tvd(Seq(Some("x"), Some("x")), Seq(Some("y")))
    assert(d._8 == 1000L && d._4 == 1L && d._5 == 1L)
    // a: 3x, 1y (N=4); b: 1x, 1z (N=2)
    // tvd = (|3*2-1*4| + |1*2-0*4| + |0*2-1*4|) / (2*4*2) = 8/16 = 1/2
    val m = tvd(Seq(Some("x"), Some("x"), Some("x"), Some("y")),
      Seq(Some("x"), Some("z")))
    assert(m._6.toLong == 8L && m._7.toLong == 16L && m._8 == 500L)
    assert(m._3 == 3L && m._4 == 1L && m._5 == 1L)
    // null category drifts like any other
    val n = tvd(Seq(None), Seq(Some("x")))
    assert(n._8 == 1000L)
  }

  test("empty slice raises loudly (TVD undefined, never 0-or-1)") {
    val e = intercept[Exception] {
      tvd(Seq(Some("x")), Seq.empty)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("empty slice")))
  }
}
