package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup: within-cluster semantic near-dup pruning. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // three tight direction-clusters of 4 near-identical vectors each, ids
  // interleaved so cluster membership isn't id-contiguous
  private lazy val vecs = (0L until 12L).map { i =>
    val c = (i % 3).toInt
    val base = Array.fill(6)(0.0f)
    base(c) = 1.0f
    base(c + 3) = 0.001f * (i / 3) // near-identical within a direction
    (i, base)
  }.toDF("vec_id", "embedding")

  test("keep-first: lowest id per near-dup group kept, rest point at it") {
    val out = Similarity.semDedup(vecs, threshold = 0.9, nlist = 3)
      .orderBy("vec_id")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(out.length == 12) // every vector present exactly once
    // ids 0,1,2 are the smallest of their direction-cluster -> keepers
    val keepIds = out.filter(_._4).map(_._1).toSet
    assert(keepIds == Set(0L, 1L, 2L))
    // each dropped vector's dup_of is the cluster's minimum id
    out.filterNot(_._4).foreach { case (id, _, dupOf, _) =>
      assert(dupOf.contains(id % 3))
    }
  }

  test("threshold above every cosine keeps everything") {
    val out = Similarity.semDedup(vecs, threshold = 1.1, nlist = 3)
    assert(out.where(!col("keep")).count() == 0)
    assert(out.count() == 12)
  }

  test("cluster cap bounds pair generation but never drops coverage") {
    // cap=2: only the two lowest ids per cluster form pairs; the other two
    // are capped OUT of pair generation -> they must still appear, as keeps
    val out = Similarity.semDedup(vecs, threshold = 0.9, nlist = 3,
      maxClusterSize = 2)
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(out.length == 12)
    assert(out.count(!_._4) == 3) // one dropped per cluster (the 2nd id)
    // capped-out vectors (ids 6..11) all keep
    assert(out.filter(_._1 >= 6L).forall(_._4))
  }
}
