package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the driver contract — entry() yields rows; every query runs at
  * sf0.001 and each has an oracle. Value-level parity vs DuckDB is checked
  * by the driver (and locally by tools/crosscheck.py).
  */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry() produces matched rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sf)
      assert(df.count() > 0, name)
    }
  }
}
