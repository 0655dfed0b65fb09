package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Dedup.dedupLines — corpus-level boilerplate line removal. */
class DedupLinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val header = "COOKIE BANNER accept all cookies"
  private val docs = Seq(
    (1L, s"$header\nunique first body\nshared footer"),
    (2L, s"$header\nunique second body\nshared footer"),
    (3L, s"$header\nunique third body"),
    // doc 4 repeats ITS OWN line twice — occurrences count corpus-wide,
    // so "self twice" reaches minCount=2 without any second document
    (4L, "self twice\nself twice\nunique fourth body"),
    // doc 5 is PURE boilerplate after removal at minCount=2
    (5L, s"$header\nshared footer")
  )

  private def run(minCount: Int): Map[Long, (String, Long, Long)] =
    Dedup.dedupLines(docs.toDF("doc_id", "text"), minCount = minCount)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, nl, nr) => id -> (t, nl, nr) }.toMap

  test("minCount=2: all corpus-duplicated lines removed, order kept, " +
    "empty docs survive as rows") {
    val got = run(2)
    assert(got(1L) == ("unique first body", 3L, 2L))
    assert(got(2L) == ("unique second body", 3L, 2L))
    assert(got(3L) == ("unique third body", 2L, 1L))
    assert(got(4L) == ("unique fourth body", 3L, 2L))
    assert(got(5L) == ("", 2L, 2L), "pure-boilerplate doc must not vanish")
  }

  test("minCount=3: the 4x header and 3x footer fall; 2x lines survive") {
    val got = run(3)
    assert(got(1L) == ("unique first body", 3L, 2L))
    assert(got(4L) == ("self twice\nself twice\nunique fourth body", 3L, 0L))
    assert(got(5L) == ("", 2L, 2L))
  }

  test("minCount=4: only the 4x header falls") {
    val got = run(4)
    assert(got(1L) == ("unique first body\nshared footer", 3L, 1L))
    assert(got(5L) == ("shared footer", 2L, 1L))
  }

  test("order preservation when a MIDDLE line is removed") {
    val d = Seq(
      (1L, "keep a\nboiler\nkeep b"),
      (2L, "boiler")).toDF("doc_id", "text")
    val got = Dedup.dedupLines(d, minCount = 2)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, nl, nr) => id -> (t, nl, nr) }.toMap
    assert(got(1L) == ("keep a\nkeep b", 3L, 1L))
    assert(got(2L) == ("", 1L, 1L))
  }

  test("the split + line-digest pass is staged: plan reads the " +
    "checkpoint, never re-scans the source") {
    val out = Dedup.dedupLines(docs.toDF("doc_id", "text"), minCount = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"), plan.take(1500))
    assert(!plan.contains("LocalTableScan"), plan.take(1500))
    assert(!plan.contains("md5"), "line digest leaked above the stage")
  }

  test("minCount < 2 rejected") {
    intercept[IllegalArgumentException] {
      Dedup.dedupLines(docs.toDF("doc_id", "text"), minCount = 1)
    }
  }
}
