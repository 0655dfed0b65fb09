package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Reconcile — order-independent per-group multiset comparison. */
class ReconcileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def diff(l: Seq[(String, Long, String)],
      r: Seq[(String, Long, String)]) =
    Reconcile.diff(
      l.toDF("sink", "id", "payload"),
      r.toDF("sink", "id", "payload"),
      Seq("sink"), Seq("id", "payload"))
      .select("sink", "n_left", "n_right", "status")
      .as[(String, Long, Long, String)].collect().toSeq.sortBy(_._1)

  test("all five verdicts, from one comparison") {
    val l = Seq(
      ("cnt", 1L, "a"), ("cnt", 2L, "b"),
      ("con", 1L, "a"), ("con", 2L, "b"),
      ("eq", 1L, "a"), ("eq", 2L, "b"),
      ("onlyl", 1L, "a"))
    val r = Seq(
      ("cnt", 1L, "a"), // row lost
      ("con", 1L, "a"), ("con", 2L, "CORRUPT"), // same count, diff row
      ("eq", 2L, "b"), ("eq", 1L, "a"), // same multiset, other order
      ("onlyr", 1L, "a"))
    assert(diff(l, r) == Seq(
      ("cnt", 2L, 1L, "count_mismatch"),
      ("con", 2L, 2L, "content_mismatch"),
      ("eq", 2L, 2L, "equal"),
      ("onlyl", 1L, 0L, "only_left"),
      ("onlyr", 0L, 1L, "only_right")))
  }

  test("equality is multiset equality: duplicate rows must match in " +
    "multiplicity, and partition/row order is irrelevant") {
    val rows = Seq(("s", 1L, "x"), ("s", 1L, "x"), ("s", 2L, "y"))
    val l = rows.toDF("sink", "id", "payload")
    val r = rows.reverse.toDF("sink", "id", "payload").repartition(7)
    val eq = Reconcile.diff(l, r, Seq("sink"), Seq("id", "payload"))
      .select("status").as[String].collect().toSeq
    assert(eq == Seq("equal"))
    // drop one duplicate -> count mismatch, not equal
    val r2 = rows.take(2).toDF("sink", "id", "payload")
    val ne = Reconcile.diff(l, r2, Seq("sink"), Seq("id", "payload"))
      .select("status").as[String].collect().toSeq
    assert(ne == Seq("count_mismatch"))
  }

  test("NULL group keys reconcile like values (null-safe join), and a " +
    "NULL value differs from the empty string") {
    val l = Seq((Option.empty[String], 1L, Option.empty[String]))
      .toDF("sink", "id", "payload")
    val r = Seq((Option.empty[String], 1L, Some("")))
      .toDF("sink", "id", "payload")
    val got = Reconcile.diff(l, r, Seq("sink"), Seq("id", "payload"))
      .select("n_left", "n_right", "status")
      .as[(Long, Long, String)].collect().toSeq
    // ONE row (the null groups joined), content differs (null != "")
    assert(got == Seq((1L, 1L, "content_mismatch")))
  }

  test("injective serialization: column boundaries cannot be faked by " +
    "value content") {
    // ("ab","c") vs ("a","bc") — a naive concat would collide
    val l = Seq(("s", "ab", "c")).toDF("sink", "a", "b")
    val r = Seq(("s", "a", "bc")).toDF("sink", "a", "b")
    val got = Reconcile.diff(l, r, Seq("sink"), Seq("a", "b"))
      .select("status").as[String].collect().toSeq
    assert(got == Seq("content_mismatch"))
  }

  test("shared-lineage inputs (resume audit: both sides derived from " +
    "one DF) do not trip the ambiguous-self-join analyzer") {
    val base = Seq(("s", 1L, "x"), ("t", 2L, "y"))
      .toDF("sink", "id", "payload")
    val got = Reconcile
      .diff(base, base.where($"sink" =!= "t"), Seq("sink"),
        Seq("id", "payload"))
      .select("sink", "status").as[(String, String)]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq(("s", "equal"), ("t", "only_left")))
  }

  test("no cartesian/nested-loop join: the verdict join is a keyed join " +
    "over group-cardinality aggregates") {
    val l = Seq(("s", 1L, "x")).toDF("sink", "id", "payload")
    val plan = Reconcile.diff(l, l, Seq("sink"), Seq("id", "payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "verdict join must be keyed:\n" + plan.take(3000))
  }

  test("parameter validation") {
    val df = Seq(("s", 1L)).toDF("sink", "id")
    intercept[IllegalArgumentException] {
      Reconcile.diff(df, df, Seq.empty, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Reconcile.diff(df, df, Seq("sink"), Seq.empty)
    }
  }
}
