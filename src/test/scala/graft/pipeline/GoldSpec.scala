package graft.pipeline

import graft.oracle.Oracle
import org.scalatest.funsuite.AnyFunSuite

/** Regression pin: oracle outputs on the tiny fixture must equal the
  * COMMITTED gold CSVs (FIXTURES.md §3). A diff here means extraction or
  * lookup semantics changed — regenerate deliberately with GoldGen and
  * review the delta, never silently.
  */
class GoldSpec extends AnyFunSuite {
  private def resource(name: String): List[String] = {
    val in = getClass.getResourceAsStream(s"/gold/$name")
    require(in != null, s"missing committed gold fixture $name")
    scala.io.Source.fromInputStream(in).getLines().toList
  }

  private lazy val turns = Fixtures.turns(GoldGen.TinyTurns)

  test("gold_counts.csv matches the oracle") {
    val got = Oracle.goldCounts(turns, GoldGen.dbs).toSeq
      .sortBy { case ((d, t, r), _) => (d, t, r) }
      .map { case ((d, t, r), c) => s"$d,$t,$r,$c" }
    assert(resource("gold_counts.csv").drop(1) == got.toList)
  }

  test("gold_stats.csv matches the oracle") {
    val got = Oracle.stats(turns, GoldGen.dbs).toSeq.sorted
      .map { case (k, v) => s"$k,$v" }
    assert(resource("gold_stats.csv").drop(1) == got.toList)
  }

  test("gold_extract.csv matches the oracle") {
    val got = Oracle.candidates(turns)
      .groupBy(_.indicator_type).toSeq.sortBy(_._1)
      .map { case (t, cs) => s"$t,${cs.size}" }
    assert(resource("gold_extract.csv").drop(1) == got.toList)
  }
}
