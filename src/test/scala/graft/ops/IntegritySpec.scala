package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Integrity — FK audit counts must match a literal recount, nulls are
  * not violations, and the join runs at key level, not row level. */
class IntegritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("orphan rows/keys, null keys, and extents match a recount") {
    // keys 1,2 exist; 7 (x3 rows) and 9 (x1) are orphans; 2 null rows
    val fact = Seq(Some(1L), Some(1L), Some(2L), Some(7L), Some(7L),
      Some(7L), Some(9L), None, None).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val got = Integrity.fkAudit(fact, "k", dim, "id", "fact.k->dim.id")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .head()
    assert(got == (("fact.k->dim.id", 9L, 2L, 4L, 2L,
      Some(7L), Some(9L))))
  }

  test("clean FK: zero orphans, NULL extents; duplicate dim keys do " +
    "not inflate counts") {
    val fact = Seq(1L, 2L, 2L).toDF("k")
    val dim = Seq(1L, 1L, 2L, 2L).toDF("id") // dup keys must be deduped
    val got = Integrity.fkAudit(fact, "k", dim, "id", "clean")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .head()
    assert(got == (("clean", 3L, 0L, 0L, 0L, None, None)))
  }

  test("fdAudit: holding and violated FDs match a recount; NULL rhs " +
    "counts as one distinct value; NULL lhs is a real group") {
    val df = Seq(
      (Some("a"), Some(1L)), (Some("a"), Some(1L)), // a -> {1}: holds
      (Some("b"), Some(1L)), (Some("b"), Some(2L)), // b -> {1,2}: bad
      (Some("c"), Some(3L)), (Some("c"), None), // c -> {3,NULL}: bad
      (Some("d"), None), (Some("d"), None), // d -> {NULL}: holds
      (None, Some(9L)), (None, Some(9L)) // NULL lhs -> {9}: holds
    ).toDF("l", "r")
    val got = Integrity.fdAudit(df, Seq("l"), "r", "l->r")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(got == (("l->r", 10L, 5L, 2L, 4L, 2L)))
  }

  test("fdAudit: clean FD and empty input degenerate") {
    val clean = Seq(("x", 1L), ("x", 1L), ("y", 2L)).toDF("l", "r")
    assert(Integrity.fdAudit(clean, Seq("l"), "r", "c")
      .as[(String, Long, Long, Long, Long, Long)].head() ==
      (("c", 3L, 2L, 0L, 0L, 1L)))
    val empty = clean.filter("r < 0")
    assert(Integrity.fdAudit(empty, Seq("l"), "r", "e")
      .as[(String, Long, Long, Long, Long, Long)].head() ==
      (("e", 0L, 0L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Integrity.fdAudit(clean, Seq.empty, "r", "x")
    }
  }

  test("the dim join input is the key-level aggregate, not fact rows") {
    val fact = (1L to 500L).map(i => i % 7).toDF("k")
    val dim = Seq(0L, 1L, 2L).toDF("id")
    val plan = Integrity.fkAudit(fact, "k", dim, "id", "p")
      .queryExecution.executedPlan.toString
    // the left join sits ABOVE a HashAggregate of the fact scan: the
    // aggregate (dedup to keys) appears between the join and the scan
    val iJoin = plan.indexOf("Join")
    val iAgg = plan.indexOf("HashAggregate", iJoin)
    val iScan = plan.indexOf("LocalTableScan", iJoin)
    assert(iJoin >= 0 && iAgg >= 0 && iAgg < iScan,
      "expected join over the key-level aggregate:\n" + plan)
  }
}
