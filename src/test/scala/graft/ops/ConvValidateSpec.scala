package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** ConvValidate — transcript structural audit. */
class ConvValidateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def audit(rows: Seq[(String, Int, String, String)]) =
    ConvValidate.audit(rows.toDF("conv_id", "turn_idx", "role", "text"))
      .select("conv_id", "n_turns", "n_dup_idx", "n_role_repeats",
        "n_empty", "first_role", "last_role", "wellformed")
      .as[(String, Long, Long, Long, Long, String, String, Boolean)]
      .collect().toSeq.sortBy(_._1)

  test("a clean alternating conversation is wellformed") {
    val rows = Seq(
      ("a", 0, "user", "hi"), ("a", 1, "assistant", "hello"),
      ("a", 2, "user", "bye"))
    assert(audit(rows) ==
      Seq(("a", 3L, 0L, 0L, 0L, "user", "user", true)))
  }

  test("dup indices, same-role runs, and empty turns each count") {
    val rows = Seq(
      // b: dup idx 1 (x2), roles u,a,a adjacent -> 1 repeat (the two
      // dup-idx turns order by role: "assistant" < "user"), text "\n"
      // is zero-token empty
      ("b", 0, "user", "hi"),
      ("b", 1, "assistant", "one"), ("b", 1, "user", "two"),
      ("b", 2, "assistant", "\n"),
      // c: three user turns in a row -> 2 repeats
      ("c", 0, "user", "x"), ("c", 1, "user", "y"), ("c", 2, "user", "z"))
    assert(audit(rows) == Seq(
      ("b", 4L, 1L, 0L, 1L, "user", "assistant", false),
      ("c", 3L, 0L, 2L, 0L, "user", "user", false)))
  }

  test("dup-idx tie order is (turn_idx, role): a same-role dup pair IS " +
    "adjacent and counts as a repeat") {
    val rows = Seq(
      ("d", 0, "user", "a"), ("d", 0, "user", "b"),
      ("d", 1, "assistant", "c"))
    assert(audit(rows) ==
      Seq(("d", 3L, 1L, 1L, 0L, "user", "assistant", false)))
  }

  test("NULL roles are values: adjacent NULL-NULL is a repeat, first " +
    "row never is, and first/last_role render NULL as ''") {
    val rows = Seq(
      ("e", 0, null, "x"), ("e", 1, null, "y"), ("e", 2, "user", "z"))
    assert(audit(rows) ==
      Seq(("e", 3L, 0L, 1L, 0L, "", "user", false)))
  }

  test("NULL text counts empty; whitespace-only text counts empty") {
    val rows = Seq(
      ("f", 0, "user", null), ("f", 1, "assistant", "  \t "),
      ("f", 2, "user", "ok"))
    assert(audit(rows) ==
      Seq(("f", 3L, 0L, 0L, 2L, "user", "user", false)))
  }

  test("one shuffle: window and rollup share the conv_id partitioning") {
    val plan = ConvValidate.audit(
      Seq(("a", 0, "user", "x")).toDF("conv_id", "turn_idx", "role",
        "text")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected one Exchange:\n${plan.take(3000)}")
  }
}
