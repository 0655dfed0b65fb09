package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Chunking — sliding token-window context assembly. */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def chunks(rows: Seq[(java.lang.Long, String)], c: Int, s: Int) =
    Chunking.slidingChunks(rows.toDF("doc_id", "text"), c, s)
      .as[(Long, Int, Int, Int, String)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("start grid, tail clamp, overlap, rejoined text") {
    // 7 tokens, chunk 4, stride 2 -> starts 0,2,4,6; lens 4,4,3,1
    val got = chunks(Seq((1L, "A b c d e f g")), c = 4, s = 2)
    assert(got == Seq(
      (1L, 0, 0, 4, "a b c d"),
      (1L, 1, 2, 4, "c d e f"),
      (1L, 2, 4, 3, "e f g"),
      (1L, 3, 6, 1, "g")))
  }

  test("a doc within one chunk yields exactly one chunk; tiling at " +
    "stride = chunk has no overlap") {
    assert(chunks(Seq((1L, "a b c")), c = 8, s = 8) ==
      Seq((1L, 0, 0, 3, "a b c")))
    assert(chunks(Seq((1L, "a b c d e")), c = 2, s = 2) == Seq(
      (1L, 0, 0, 2, "a b"), (1L, 1, 2, 2, "c d"), (1L, 2, 4, 1, "e")))
  }

  test("every token is covered and consecutive chunks overlap by " +
    "chunk - stride (the training-window contract)") {
    val text = (0 until 53).map(i => s"t$i").mkString(" ")
    val got = chunks(Seq((1L, text)), c = 16, s = 8)
    // coverage: union of [start, start+len) == [0, 53)
    val covered = got.flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered == (0 until 53).toSet)
    // overlap: consecutive full chunks share exactly c - s tokens
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 - a._3 == 8)
      case _ =>
    }
  }

  test("NULL ids, NULL texts, and zero-token texts yield no chunks") {
    assert(chunks(Seq((null, "a b"), (1L, null), (2L, " \n\t "),
      (3L, "ok")), c = 4, s = 2) == Seq((3L, 0, 0, 1, "ok")))
  }

  test("map-side only: no exchange in the plan, and the tokenizer is " +
    "not re-evaluated per chunk") {
    val df = Chunking.slidingChunks(
      Seq((1L, "a b c d e f")).toDF("doc_id", "text"), 2, 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"zero shuffles:\n$plan")
    // the split appears a bounded number of times (filter + stage), not
    // once per produced chunk column reference
    val evals = "split\\(".r.findAllIn(plan).length
    assert(evals <= 2, s"tokenizer evaluated $evals times:\n$plan")
  }

  test("stride > chunkTokens rejected (token-dropping is sampling)") {
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(Seq((1L, "a")).toDF("doc_id", "text"), 2, 3)
    }
  }
}
