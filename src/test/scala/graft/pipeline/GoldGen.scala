package graft.pipeline

import graft.intel.IntelDb
import graft.oracle.Oracle

/** One-shot generator for the committed gold fixtures
  * (src/test/resources/gold/, FIXTURES.md §3). Run manually when fixture
  * generation rules change — never silently:
  *   sbt "Test/runMain graft.pipeline.GoldGen"
  */
object GoldGen {
  val TinyTurns = 2000

  def dbs: Seq[IntelDb] = Seq(
    IntelDb.build("threats", Fixtures.intelThreats),
    IntelDb.build("allowlist", Fixtures.intelAllowlist))

  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("src/test/resources/gold")
    java.nio.file.Files.createDirectories(dir)
    val turns = Fixtures.turns(TinyTurns)

    val gold = Oracle.goldCounts(turns, dbs).toSeq
      .sortBy { case ((d, t, r), _) => (d, t, r) }
      .map { case ((d, t, r), c) => s"$d,$t,$r,$c" }
    java.nio.file.Files.writeString(dir.resolve("gold_counts.csv"),
      "database_id,indicator_type,role,match_count\n" +
        gold.mkString("", "\n", "\n"))

    val stats = Oracle.stats(turns, dbs).toSeq.sorted
      .map { case (k, v) => s"$k,$v" }
    java.nio.file.Files.writeString(dir.resolve("gold_stats.csv"),
      "stat,value\n" + stats.mkString("", "\n", "\n"))

    val extract = Oracle.candidates(turns)
      .groupBy(_.indicator_type).toSeq.sortBy(_._1)
      .map { case (t, cs) => s"$t,${cs.size}" }
    java.nio.file.Files.writeString(dir.resolve("gold_extract.csv"),
      "indicator_type,n\n" + extract.mkString("", "\n", "\n"))
    println(s"gold fixtures written to $dir")
  }
}
