package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** SnapshotDiff — row-level change capture. */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val old = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L),
    (5L, null.asInstanceOf[String], 50L))
    .toDF("id", "cat", "v")
  private lazy val neu = Seq(
    (1L, "a", 10L),        // unchanged
    (2L, "B", 20L),        // cat changed
    (3L, "c", 31L),        // v changed
    (6L, "e", 60L),        // added
    (5L, null.asInstanceOf[String], 50L)) // null == null: unchanged
    .toDF("id", "cat", "v")

  private def run(includeUnchanged: Boolean = false) =
    SnapshotDiff.diff(old, neu, Seq("id"), Seq("cat", "v"),
      includeUnchanged)
      .orderBy("id")
      .select("id", "verdict", "changed_cols")
      .as[(Long, String, String)].collect().toSeq

  test("added / removed / changed with per-column attribution; " +
    "null<=>null is NOT a change") {
    assert(run() == Seq(
      (2L, "changed", "cat"),
      (3L, "changed", "v"),
      (4L, "removed", ""),
      (6L, "added", "")))
  }

  test("includeUnchanged keeps the identical rows") {
    assert(run(includeUnchanged = true).map(t => t._1 -> t._2).toMap ==
      Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
        4L -> "removed", 5L -> "unchanged", 6L -> "added"))
  }

  test("multi-column change lists both columns in caller order") {
    val n2 = Seq((2L, "X", 99L)).toDF("id", "cat", "v")
    val o2 = Seq((2L, "b", 20L)).toDF("id", "cat", "v")
    val got = SnapshotDiff.diff(o2, n2, Seq("id"), Seq("cat", "v"))
      .select("changed_cols").as[String].collect().toSeq
    assert(got == Seq("cat,v"))
  }

  test("NULL -> value and value -> NULL are changes (null-safe compare)") {
    val o = Seq((1L, null.asInstanceOf[String]), (2L, "x"))
      .toDF("id", "cat")
    val n = Seq((1L, "y"), (2L, null.asInstanceOf[String]))
      .toDF("id", "cat")
    val got = SnapshotDiff.diff(o, n, Seq("id"), Seq("cat"))
      .orderBy("id").select("verdict", "changed_cols")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("changed", "cat"), ("changed", "cat")))
  }

  test("old/new values ride along for changed rows") {
    val r = SnapshotDiff.diff(old, neu, Seq("id"), Seq("cat", "v"))
      .where($"id" === 3L)
      .select("old_v", "new_v").as[(Long, Long)].collect()(0)
    assert(r == ((30L, 31L)))
  }

  test("duplicate keys in either snapshot raise loudly") {
    val dup = Seq((1L, "a", 1L), (1L, "a", 2L)).toDF("id", "cat", "v")
    val e = intercept[Exception] {
      SnapshotDiff.diff(dup, neu, Seq("id"), Seq("cat", "v")).count()
    }
    assert(e.getMessage.contains("duplicate key"))
    val e2 = intercept[Exception] {
      SnapshotDiff.diff(old, dup, Seq("id"), Seq("cat", "v")).count()
    }
    assert(e2.getMessage.contains("duplicate key"))
  }
}
