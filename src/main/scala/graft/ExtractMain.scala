package graft

import graft.extract.ScanConfig
import graft.functions.GraftFunctions
import graft.io.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point for extraction WITHOUT matching — the
  * `matchy extract` CLI analog (bin/commands/extract_cmd.rs):
  *
  * {{{
  * spark-submit --class graft.ExtractMain matchyspark.jar \
  *   --in <parquet-table | text-file | -> --out <dir> \
  *   [--format json|csv|text] [--unique] \
  *   [--types ipv4,ipv6,domain,email,hash,bitcoin,ethereum,monero] \
  *   [--min-domain-labels 2] [--no-boundaries]
  * }}}
  *
  * Input shapes: a parquet transcript table (extracts from `text`), a
  * plain text file (line-per-turn, like the reference's file path), or `-`
  * for stdin (S3). Output is the S11 extract sink (`Sinks.extractDump`):
  * `{"type":...,"value":...}` NDJSON, CSV with header, or value-only text,
  * with `--unique` deduplicating on value like the reference's flag
  * (extract_cmd.rs:133-137).
  */
object ExtractMain {

  private[graft] def configFor(types: Option[String], minLabels: Int,
      boundaries: Boolean): ScanConfig = types match {
    case None => ScanConfig(minDomainLabels = minLabels,
      requireWordBoundaries = boundaries)
    case Some(list) =>
      val on = list.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty)
        .toSet
      val unknown = on -- Set("ipv4", "ipv6", "domain", "email", "hash",
        "bitcoin", "ethereum", "monero")
      require(unknown.isEmpty, s"unknown --types: ${unknown.mkString(",")}")
      ScanConfig(
        domains = on("domain"), emails = on("email"),
        ipv4 = on("ipv4"), ipv6 = on("ipv6"), hashes = on("hash"),
        bitcoin = on("bitcoin"), ethereum = on("ethereum"),
        monero = on("monero"),
        minDomainLabels = minLabels, requireWordBoundaries = boundaries)
  }

  def main(args: Array[String]): Unit = {
    val opts = scala.collection.mutable.Map[String, String]()
    var unique = false
    var boundaries = true
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--unique" => unique = true; i += 1
        case "--no-boundaries" => boundaries = false; i += 1
        case k if k.startsWith("--") && i + 1 < args.length =>
          opts(k.drop(2)) = args(i + 1); i += 2
        case other => sys.error(s"unexpected argument: $other")
      }
    }
    val inPath = opts.getOrElse("in", sys.error("--in <path|-> is required"))
    val outPath = opts.getOrElse("out", sys.error("--out <dir> is required"))

    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, inPath, outPath, opts.getOrElse("format", "json"), unique,
      configFor(opts.get("types"),
        opts.getOrElse("min-domain-labels", "2").toInt, boundaries))
    spark.stop()
  }

  /** The extract job itself (main minus session lifecycle, testable). */
  def run(spark: SparkSession, inPath: String, outPath: String,
      format: String, unique: Boolean, config: ScanConfig): Unit = {
    // directory sniffing must go through the Hadoop FS of the PATH, not
    // java.io.File: a remote parquet directory (hdfs://, s3a://) is not a
    // local dir, and the local-only check silently fell through to
    // spark.read.text — scanning raw parquet bytes as lines (round-5 find)
    def isDir(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      try fs.getFileStatus(hp).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    }
    val turns =
      if (inPath == "-") graft.sources.StdinSource.readTurns(spark)
      else if (inPath.endsWith(".parquet") || isDir(inPath))
        spark.read.parquet(inPath)
      else spark.read.text(inPath).withColumnRenamed("value", "text")
    val cands = turns
      .select(explode(GraftFunctions.extract_iocs(col("text"), config))
        .as("ioc"))
      .select(col("ioc.indicator_type").as("indicator_type"),
        col("ioc.value").as("value"))
    Sinks.extractDump(cands, outPath, format, unique)
  }
}
