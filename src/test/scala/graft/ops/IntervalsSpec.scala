package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Intervals.mergeIntervals — the sweep vs a brute-force union model. */
class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def merge(rows: Seq[(String, Long, Long)],
      touching: Boolean = true) =
    Intervals.mergeIntervals(rows.toDF("k", "s", "e"), Seq("k"),
      "s", "e", touching)
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy(t => (t._1, t._2))

  /** Brute-force model: mark covered points, read off runs. */
  private def model(rows: Seq[(String, Long, Long)],
      touching: Boolean): Seq[(String, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sortBy(identity)
      val out = collection.mutable.ListBuffer
        .empty[(Long, Long, Long)]
      for ((s, e) <- sorted) {
        val cond = out.nonEmpty &&
          (if (touching) out.last._2 >= s else out.last._2 > s)
        if (cond) {
          val (ps, pe, n) = out.remove(out.size - 1)
          out += ((ps, math.max(pe, e), n + 1))
        } else out += ((s, e, 1L))
      }
      out.map { case (s, e, n) => (k, s, e, n) }
    }.sortBy(t => (t._1, t._2))

  test("overlap, containment, bridge-past-successor, and gaps") {
    // long [0,100) bridges past [10,20) and [30,40); [150,160) separate
    val rows = Seq(("a", 0L, 100L), ("a", 10L, 20L), ("a", 30L, 40L),
      ("a", 150L, 160L))
    assert(merge(rows) == Seq(("a", 0L, 100L, 3L),
      ("a", 150L, 160L, 1L)))
  }

  test("touching spans: merged by default, separate with touching=false") {
    val rows = Seq(("a", 0L, 10L), ("a", 10L, 20L))
    assert(merge(rows) == Seq(("a", 0L, 20L, 2L)))
    assert(merge(rows, touching = false) ==
      Seq(("a", 0L, 10L, 1L), ("a", 10L, 20L, 1L)))
  }

  test("keys are independent; zero-length intervals merge like points") {
    val rows = Seq(("a", 0L, 5L), ("b", 0L, 5L), ("a", 3L, 3L),
      ("b", 50L, 50L))
    assert(merge(rows) == Seq(("a", 0L, 5L, 2L), ("b", 0L, 5L, 1L),
      ("b", 50L, 50L, 1L)))
  }

  test("brute-force equivalence on pseudo-random interval sets") {
    for (seed <- 1 to 3; touching <- Seq(true, false)) {
      val rows = (0 until 500).map { i =>
        val h = i * 2654435761L + seed * 104729L
        val s = (h >>> 7) % 2000
        (s"k${h % 5}", s, s + (h >>> 19) % 100)
      }
      assert(merge(rows, touching) == model(rows, touching),
        s"seed=$seed touching=$touching")
    }
  }

  test("start > end raises loudly; NULL endpoints are dropped") {
    val bad = Seq(("a", 10L, 5L))
    val ex = intercept[Exception] { merge(bad) }
    assert(ex.getMessage.contains("mergeIntervals"))
    val withNulls = Seq(("a", Long.box(1L), Long.box(5L)),
      ("a", null, Long.box(9L)), ("a", Long.box(4L), null))
      .toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(withNulls, Seq("k"), "s", "e")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 5L, 1L)))
  }
}
