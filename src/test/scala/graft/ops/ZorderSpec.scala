package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Zorder — bit-exact Morton interleave + the guard rails. */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def zkeys(pts: Seq[(java.lang.Long, java.lang.Long)]): Seq[java.lang.Long] =
    Zorder.withZkey(pts.toDF("x", "y"), "x", "y")
      .select("zkey").collect()
      .map(r => if (r.isNullAt(0)) null else Long.box(r.getLong(0))).toSeq

  /** Reference interleave: bit i of x at 2i, bit i of y at 2i+1. */
  private def model(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("known values: (0,0)=0, (1,0)=1, (0,1)=2, (3,1)=7, (65535,65535)") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L),
      (65535L, 65535L)).map { case (a, b) => (Long.box(a), Long.box(b)) }
    assert(zkeys(pts) == Seq(0L, 1L, 2L, 7L, 4294967295L).map(Long.box))
  }

  test("bit-exact against the per-bit model across pseudo-random points") {
    val pts = (0 until 500).map { i =>
      val h = i * 2654435761L + 12345L
      (Long.box((h >>> 5) % 65536), Long.box((h >>> 23) % 65536))
    }
    assert(zkeys(pts) == pts.map { case (a, b) => Long.box(model(a, b)) })
  }

  test("locality: a 2^k-aligned square block is one contiguous key range") {
    // the 4x4 block at (8,4): keys must occupy exactly one span of 16
    val pts = for (x <- 8L until 12L; y <- 4L until 8L)
      yield (Long.box(x), Long.box(y))
    val ks = zkeys(pts).map(Long.unbox(_)).sorted
    assert(ks.last - ks.head == 15L && ks.distinct.size == 16)
  }

  test("NULL coordinates give a NULL key") {
    assert(zkeys(Seq((null, Long.box(3L)))) == Seq(null))
    assert(zkeys(Seq((Long.box(3L), null))) == Seq(null))
  }

  test("out-of-range coordinates throw loudly instead of masking") {
    for (bad <- Seq((Long.box(65536L), Long.box(0L)),
      (Long.box(0L), Long.box(-1L)))) {
      val e = intercept[Exception] { zkeys(Seq(bad)) }
      assert(e.getMessage.contains("zkey2 coordinate out of"),
        s"bad=$bad got ${e.getMessage.take(120)}")
    }
  }
}
