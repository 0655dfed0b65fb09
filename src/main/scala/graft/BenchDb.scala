package graft

import graft.intel.IntelDb
import graft.model.IntelEntry
import graft.pipeline.Fixtures
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Capability benchmark — the `matchy bench ip|literal|pattern|combined`
  * analog (bin/matchy.rs:231-273): build a database of N synthetic entries
  * of one capability class, then drive Q lookups at a controlled hit rate
  * and pattern style, distributed. Tracks the reference's documented
  * glob-verification cliff (complex patterns 10-100x slower than prefix,
  * DEVELOPMENT.md:183-194) so regressions in the paraglob path show up as
  * numbers, not anecdotes.
  *
  * Env knobs (mirroring the reference's flags):
  *   GRAFT_BENCH_DB_TYPE   ip|literal|pattern|combined   (default ip)
  *   GRAFT_BENCH_COUNT     entries                       (default 100000)
  *   GRAFT_BENCH_QUERIES   lookups                       (default 2000000)
  *   GRAFT_BENCH_HIT_RATE  percent 0-100                 (default 10)
  *   GRAFT_BENCH_PATTERN_STYLE prefix|suffix|mixed|complex (default complex)
  *
  * Prints ONE JSON line with build time + lookup throughput.
  */
object BenchDb {

  private def entry(dbType: String, style: String, i: Int,
      count: Int): String = {
    def patternFor(j: Int): String = style match {
      case "prefix" => s"err$j-*"
      case "suffix" => s"*.host$j.example.com"
      case "mixed" => if (j % 2 == 0) s"err$j-*" else s"*.host$j.example.com"
      case _ => s"*seg${j}a*seg${j}b*" // complex: multi-wildcard verification
    }
    dbType match {
      case "ip" => s"10.${(i >> 8) & 0xff}.${i & 0xff}.0/24"
      case "literal" => s"host$i.example${i % 97}.com"
      case "pattern" => patternFor(i)
      case "combined" => (i % 3) match {
        case 0 => s"10.${(i >> 8) & 0xff}.${i & 0xff}.0/24"
        case 1 => s"host$i.example${i % 97}.com"
        case _ => patternFor(i)
      }
    }
  }

  /** Query key for row r: a hit against entry j with probability hitRate%,
    * else a guaranteed miss of the same shape.
    */
  def queryKey(dbType: String, style: String, r: Long, count: Int,
      hitRate: Int): (String, String) = {
    val h = Fixtures.mix(r)
    val j = ((h >>> 17) % count).toInt
    val isHit = ((h >>> 3) % 100) < hitRate
    def textFor(j: Int, hit: Boolean): String = style match {
      case "prefix" =>
        if (hit) s"err$j-trailer" else s"rre$j-trailer"
      case "suffix" =>
        if (hit) s"sub.host$j.example.com" else s"sub.tsoh$j.example.com"
      case "mixed" =>
        if (j % 2 == 0) { if (hit) s"err$j-x" else s"rre$j-x" }
        else { if (hit) s"a.host$j.example.com" else s"a.tsoh$j.example.com" }
      case _ =>
        if (hit) s"pre seg${j}a mid seg${j}b post"
        else s"pre seg${j}a mid seg${j}x post"
    }
    dbType match {
      case "ip" =>
        if (isHit) (s"10.${(j >> 8) & 0xff}.${j & 0xff}.${(h & 0x7f).toInt + 1}", "ipv4")
        else (s"172.31.${(j >> 8) & 0xff}.${j & 0xff}", "ipv4")
      case "literal" =>
        if (isHit) (s"host$j.example${j % 97}.com", "domain")
        else (s"miss$j.example${j % 97}.com", "domain")
      case "pattern" => (textFor(j, isHit), "domain")
      case "combined" => (j % 3) match {
        case 0 =>
          if (isHit) (s"10.${(j >> 8) & 0xff}.${j & 0xff}.9", "ipv4")
          else (s"172.31.0.9", "ipv4")
        case 1 =>
          if (isHit) (s"host$j.example${j % 97}.com", "domain")
          else (s"miss$j.example${j % 97}.com", "domain")
        case _ => (textFor(j, isHit), "domain")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dbType = sys.env.getOrElse("GRAFT_BENCH_DB_TYPE", "ip")
    val count = sys.env.getOrElse("GRAFT_BENCH_COUNT", "100000").toInt
    val queries = sys.env.getOrElse("GRAFT_BENCH_QUERIES", "2000000").toLong
    val hitRate = sys.env.getOrElse("GRAFT_BENCH_HIT_RATE", "10").toInt
    val style = sys.env.getOrElse("GRAFT_BENCH_PATTERN_STYLE", "complex")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val t0 = System.nanoTime()
    val entries = (0 until count).map(i =>
      IntelEntry(entry(dbType, style, i, count), "high", "bench", "bench", 50))
    val db = IntelDb.build(s"bench-$dbType", entries)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-db-$dbType")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dbTypeB = dbType; val styleB = style; val countB = count
    val hitRateB = hitRate
    val keys = spark.range(0L, queries, 1L, cpus * 4)
      .map { r =>
        val (k, t) = queryKey(dbTypeB, styleB, r, countB, hitRateB)
        (k, t)
      }.toDF("value", "indicator_type")
    val probed = keys.select(
      size(graft.functions.IntelLookupMulti.column(
        col("value"), col("indicator_type"), Seq(db))).as("nhits"))
    // warm (codegen+JIT), then time
    probed.agg(sum("nhits")).head()
    val t1 = System.nanoTime()
    val hits = probed.agg(sum(when(col("nhits") > 0, 1L).otherwise(0L)))
      .head().getLong(0)
    val lookupSec = (System.nanoTime() - t1) / 1e9
    spark.stop()

    val qps = queries / lookupSec
    val json =
      s"""{"bench":"db","db_type":"$dbType","count":$count,""" +
        s""""query_count":$queries,"hit_rate":$hitRate,""" +
        s""""pattern_style":"$style","build_sec":${f"$buildSec%.3f"},""" +
        s""""lookup_sec":${f"$lookupSec%.3f"},"queries_per_sec":${f"$qps%.0f"},""" +
        s""""hits":$hits}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"BENCH_DB_$dbType.json"), json + "\n")
    catch { case _: Throwable => () }
    println(json)
  }
}
