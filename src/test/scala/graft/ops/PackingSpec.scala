package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Packing — sequence packing + context-window truncation. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def pack(rows: Seq[(String, Long)], budget: Long,
      shards: Int = 1) =
    Packing.packSequences(rows.toDF("doc_id", "n_tokens"), budget, shards)
      .as[(String, Long, Int, Int, Int)].collect().toSeq
      .sortBy(r => (r._3, r._4, r._5))

  /** Reference first-fit scan (the documented rule). */
  private def model(rows: Seq[(String, Long)], budget: Long)
      : Seq[(String, Long, Int, Int, Int)] = {
    var bin = 0; var fill = 0L; var pos = 0
    rows.sortBy(_._1).map { case (id, t) =>
      if (fill > 0L && fill + t > budget) { bin += 1; fill = 0L; pos = 0 }
      fill += t
      val r = (id, t, 0, bin, pos); pos += 1; r
    }
  }

  test("first-fit fills bins in id order; overflow opens the next bin") {
    val rows = Seq(("a", 3L), ("b", 4L), ("c", 2L), ("d", 5L), ("e", 1L))
    // order a,b,c,d,e vs budget 8: [a3+b4(7), c2? 9>8 -> bin1: c2+d5(7),
    // e1? 8<=8 stays] -> bins {a,b},{c,d,e}
    assert(pack(rows, budget = 8) == Seq(
      ("a", 3L, 0, 0, 0), ("b", 4L, 0, 0, 1),
      ("c", 2L, 0, 1, 0), ("d", 5L, 0, 1, 1), ("e", 1L, 0, 1, 2)))
  }

  test("matches the reference scan on a pseudo-random corpus") {
    val rows = (0 until 500).map { i =>
      (f"doc$i%04d", ((i * 2654435761L) >>> 7) % 40 + 1)
    }
    assert(pack(rows, budget = 100) == model(rows, budget = 100))
  }

  test("an over-budget sequence occupies its own bin, never dropped") {
    val rows = Seq(("a", 2L), ("b", 99L), ("c", 2L))
    assert(pack(rows, budget = 10) == Seq(
      ("a", 2L, 0, 0, 0), ("b", 99L, 0, 1, 0), ("c", 2L, 0, 2, 0)))
  }

  test("zero-token and NULL-token sequences pack at zero cost; NULL ids " +
    "drop") {
    val df = Seq((Some("a"), Some(5L)), (Some("b"), None),
      (None, Some(3L)), (Some("c"), Some(0L)))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(df, budget = 5, numShards = 1)
      .as[(String, Long, Int, Int, Int)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("a", 5L, 0, 0, 0), ("b", 0L, 0, 0, 1),
      ("c", 0L, 0, 0, 2)))
  }

  test("shards pack independently: adding a doc never disturbs other " +
    "shards' bins (growth stability)") {
    val rows = (0 until 200).map(i => (s"doc$i", (i % 7 + 1).toLong))
    val before = pack(rows, budget = 12, shards = 8)
    val after = pack(rows :+ ("newdoc", 5L), budget = 12, shards = 8)
    val newShard = after.find(_._1 == "newdoc").get._3
    assert(before.filter(_._3 != newShard) ==
      after.filter(r => r._3 != newShard && r._1 != "newdoc"))
  }

  test("one shuffle, no per-group buffering operator in the plan") {
    val plan = Packing.packSequences(
      Seq(("a", 1L)).toDF("doc_id", "n_tokens"), 8, 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected one Exchange:\n${plan.take(3000)}")
    assert(!plan.contains("ObjectHashAggregate") &&
      !plan.contains("SortAggregate"), "scan must stream, not buffer")
  }

  private def trunc(rows: Seq[(String, Int, String, String)],
      budget: Long) =
    Packing.truncateTail(
      rows.toDF("conv_id", "turn_idx", "role", "text"), budget)
      .select("conv_id", "turn_idx", "n_tokens", "cum_from_end")
      .as[(String, Int, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("truncateTail keeps the newest suffix within budget") {
    val rows = Seq(
      ("a", 0, "user", "one two three"), // 3 tokens, cum 7 -> dropped
      ("a", 1, "assistant", "four five"), // 2 tokens, cum 4 -> kept
      ("a", 2, "user", "six seven")) // 2 tokens, cum 2 -> kept
    assert(trunc(rows, budget = 5) ==
      Seq(("a", 1, 2L, 4L), ("a", 2, 2L, 2L)))
  }

  test("strict budget: a conversation whose final turn alone overflows " +
    "yields zero rows; NULL text costs zero tokens") {
    val rows = Seq(
      ("b", 0, "user", "a b c d e f"),
      ("c", 0, "user", "hi"), ("c", 1, "assistant", null))
    assert(trunc(rows, budget = 3) ==
      Seq(("c", 0, 1L, 1L), ("c", 1, 0L, 0L)))
  }

  test("truncateTail rejects clashing output names") {
    intercept[IllegalArgumentException] {
      Packing.truncateTail(
        Seq(("a", 0, 1L)).toDF("conv_id", "turn_idx", "n_tokens"), 5)
    }
  }
}
