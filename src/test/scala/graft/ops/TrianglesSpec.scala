package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Triangles — degree-ordered orientation vs brute-force enumeration. */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(edges: Seq[(java.lang.Long, java.lang.Long)]) = {
    val out = Triangles.triangleCount(edges.toDF("x", "y"), "x", "y").collect()(0)
    (out.getLong(0), out.getLong(1), out.getLong(2))
  }

  /** Brute-force model over the canonical edge set. */
  private def model(edges: Seq[(java.lang.Long, java.lang.Long)]) = {
    val e = edges.collect { case (a, b) if a != null && b != null &&
      a != b => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    // nodes must iterate as a Seq: a Set inner generator would collapse
    // the `yield 1` per-edge into a one-element Set (counting edges
    // that close >=1 triangle, not triangles)
    val tri = (for {
      (u, v) <- e.toSeq; w <- nodes.toSeq
      if w > v && e((u, w)) && e((v, w))
    } yield 1).size
    (nodes.size.toLong, e.size.toLong, tri.toLong)
  }

  test("K4 has 4 triangles; a square has 0; one triangle has 1") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L)
      yield (Long.box(i), Long.box(j))
    assert(run(k4) == (4L, 6L, 4L))
    assert(run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .map { case (a, b) => (Long.box(a), Long.box(b)) }) == (4L, 4L, 0L))
    assert(run(Seq((5L, 9L), (9L, 7L), (7L, 5L))
      .map { case (a, b) => (Long.box(a), Long.box(b)) }) == (3L, 3L, 1L))
  }

  test("duplicate, reversed, self-loop, and NULL edges collapse/drop") {
    val edges = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 4L), (null, 1L), (2L, null))
    assert(run(edges) == (3L, 3L, 1L))
  }

  test("hub skew: a star contributes zero wedges from the hub") {
    // hub 0 connected to 1..40 plus one closing edge (1,2): 1 triangle
    val edges = (1L to 40L).map(i => (Long.box(0L), Long.box(i))) :+
      ((Long.box(1L), Long.box(2L)))
    assert(run(edges) == (41L, 41L, 1L))
  }

  test("brute-force equivalence on pseudo-random graphs") {
    for (seed <- 1 to 4) {
      val edges = (0 until 400).map { i =>
        val h = i * 2654435761L + seed * 7919L
        (Long.box((h >>> 3) % 30), Long.box((h >>> 17) % 30))
      }
      assert(run(edges) == model(edges), s"seed=$seed")
    }
  }

  test("empty and edgeless inputs yield a single zero row") {
    assert(run(Seq.empty) == (0L, 0L, 0L))
    assert(run(Seq((Long.box(1L), Long.box(1L)))) == (0L, 0L, 0L))
  }
}
