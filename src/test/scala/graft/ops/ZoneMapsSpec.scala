package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ZoneMaps — the audit must agree with a literal replay of the
  * min/max-pruning rules, and its invariants must hold. */
class ZoneMapsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val preds = Seq((0L, 99L), (150L, 250L), (900L, 1000L))

  private def audit(rows: Seq[(Long, Option[Long])]) =
    ZoneMaps.pruningAudit(rows.toDF("b", "v"), col("b"), "v", preds)
      .orderBy("pred_idx")
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq

  test("matches a literal replay of min/max pruning on a mixed corpus") {
    // bucket 0: 10..90, bucket 1: 200..260, bucket 2: null-only,
    // bucket 3: 95..105 straddles pred 0's upper edge (scan, low match)
    val rows = Seq[(Long, Option[Long])](
      (0L, Some(10L)), (0L, Some(90L)), (0L, None),
      (1L, Some(200L)), (1L, Some(260L)),
      (2L, None), (2L, None),
      (3L, Some(95L)), (3L, Some(105L)))
    val got = audit(rows)
    val buckets = rows.groupBy(_._1).map { case (b, rs) =>
      val vs = rs.flatMap(_._2)
      (b, vs.sorted.headOption, vs.sorted.lastOption, rs.size, vs)
    }.toSeq
    preds.zipWithIndex.foreach { case ((lo, hi), i) =>
      val pruned = buckets.filter { case (_, mn, mx, _, _) =>
        mn.isEmpty || mx.get < lo || mn.get > hi }
      val scanned = buckets.diff(pruned)
      val row = got(i)
      assert(row._4 == buckets.size && row._5 == pruned.size, s"pred $i")
      assert(row._6 == rows.size, s"rows_total pred $i")
      assert(row._7 == scanned.map(_._4).sum, s"rows_scanned pred $i")
      assert(row._8 == buckets.flatMap(_._5)
        .count(v => v >= lo && v <= hi), s"rows_matched pred $i")
      assert(row._8 <= row._7 && row._7 <= row._6 && row._5 <= row._4)
    }
    // the all-null bucket is pruned by EVERY predicate
    assert(got.forall(_._5 >= 1))
  }

  test("a value-clustered layout prunes what an uncorrelated layout " +
    "cannot (the write-side sort's measurable win)") {
    val data = (0 until 400).map { i =>
      val v = (i * 2654435761L) % 1000L // uncorrelated with i
      (i.toLong, v)
    }
    val df = data.toDF("id", "v")
    val byInsert = ZoneMaps.pruningAudit(
      df, expr("id div 50"), "v", Seq((150L, 250L)))
      .select("n_pruned", "rows_scanned", "rows_matched")
      .as[(Long, Long, Long)].head()
    val byValue = ZoneMaps.pruningAudit(
      df, expr("v div 50"), "v", Seq((150L, 250L)))
      .select("n_pruned", "rows_scanned", "rows_matched")
      .as[(Long, Long, Long)].head()
    assert(byInsert._1 == 0L, "uncorrelated layout prunes nothing")
    assert(byValue._1 > 0L && byValue._2 < byInsert._2)
    assert(byInsert._3 == byValue._3, "matched rows are layout-invariant")
    // value-width-50 buckets align with 150 exactly; only the 250..299
    // straddle bucket scans false positives
    assert(byValue._2 == data.map(_._2)
      .count(v => v >= 150 && v < 300))
  }

  test("empty predicate list and inverted ranges are rejected") {
    val df = Seq((1L, 2L)).toDF("b", "v")
    intercept[IllegalArgumentException] {
      ZoneMaps.pruningAudit(df, col("b"), "v", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      ZoneMaps.pruningAudit(df, col("b"), "v", Seq((5L, 4L)))
    }
  }
}
