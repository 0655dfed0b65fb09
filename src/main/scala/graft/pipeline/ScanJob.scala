package graft.pipeline

import graft.functions.{GraftFunctions, IntelLookupMulti}
import graft.intel.IntelDb
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship scan pipeline (SURVEY.md §3.1), expressed as one declarative
  * Spark plan:
  *
  * {{{
  * turns                                         // table scan (S1)
  *   .withColumn(ioc, explode(extract_iocs(text)))  // E1-E8, one pass
  *   .withColumn(hit, explode(intel_lookup(...)))   // L2/L3/L4 per db (L8)
  *   .join(broadcast(intelMeta), ...)               // metadata BHJ
  *   -> fan-out writes per indicator_type + clean sink (R4)
  *   -> gold counts + stats (A1-A6, A10) + per-partition lineage metrics
  * }}}
  *
  * Scale notes (the 100 TB story):
  *  - extraction + both lookups are map-side (broadcast structures inside
  *    codegen'd expressions) — ZERO shuffles until the final aggregate,
  *    mirroring the reference's embarrassingly-parallel workers
  *    (processing/parallel.rs:494-700);
  *  - explode() drops empty arrays, so clean turns never produce candidate
  *    rows (the "AC finds nothing => line is clean fast" behavior);
  *  - fan-out writes repartition by a conv_id bucket (checkpoint/resume
  *    unit) — skewed conversations are spread because the bucket key is
  *    hash(conv_id), and AQE skew handling stays on for the aggregates.
  */
object ScanJob {

  val CandidateCols: Seq[String] = Seq(
    "conv_id", "turn_idx", "role", "indicator_type", "value",
    "matched_text", "span_start", "span_end")

  /** Extraction stage: one row per (turn, extracted indicator). */
  def candidates(turns: DataFrame): DataFrame =
    turns
      .select(col("conv_id"), col("turn_idx"), col("role"),
        explode(GraftFunctions.extract_iocs(col("text"))).as("ioc"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("ioc.*"))

  /** Intel metadata as a DataFrame, one row per (db_idx, entry_idx) — the
    * broadcast side of the enrichment join.
    */
  def intelMetaDf(spark: SparkSession, dbs: Seq[IntelDb]): DataFrame = {
    import spark.implicits._
    dbs.zipWithIndex.flatMap { case (db, d) =>
      db.entries.zipWithIndex.map { case (m, i) =>
        (d, i, db.databaseId, m.entry, m.entryType, m.threatLevel,
          m.category, m.source, m.confidence)
      }
    }.toDF("db_idx", "entry_idx", "database_id", "entry", "entry_type",
      "threat_level", "category", "source", "confidence")
  }

  /** Enrichment stage (L2+L3+L4 x L8): probe ALL broadcast databases in one
    * generator (the input is extracted exactly once), keep hits (F1), then
    * attach metadata via an explicit broadcast hash join.
    */
  def enriched(cands: DataFrame, dbs: Seq[IntelDb],
      spark: SparkSession): DataFrame = {
    val hits = cands
      .withColumn("hit", explode(
        IntelLookupMulti.column(col("value"), col("indicator_type"), dbs)))
      .select((CandidateCols.map(col) :+
        col("hit.db_idx").as("db_idx") :+
        col("hit.entry_idx").as("entry_idx") :+
        col("hit.prefix_len").as("prefix_len") :+
        col("hit.match_type").as("match_type")): _*)
    val meta = intelMetaDf(spark, dbs)
    hits
      .join(broadcast(meta), Seq("db_idx", "entry_idx"), "inner")
      .drop("db_idx")
      .withColumn("cidr",
        when(col("match_type") === "ip",
          concat(col("value"), lit("/"), col("prefix_len"))))
  }

  /** Full matched dataset for a set of databases. With `prescreen` the
    * broadcast clean-turn filter (CleanPreScreen — a sound superset filter)
    * rejects turns before extraction; output is identical either way
    * (asserted by ScanJobSpec).
    */
  def matched(turns: DataFrame, dbs: Seq[IntelDb], spark: SparkSession,
      prescreen: Boolean = false): DataFrame = {
    val input =
      if (!prescreen) turns
      else {
        val screen = graft.intel.CleanPreScreen.build(dbs)
        turns.where(graft.functions.MightMatch.column(col("text"), screen))
      }
    enriched(candidates(input), dbs, spark)
  }

  /** North-rule gold aggregate (A10): per-sink match counts. */
  def goldCounts(matchedDf: DataFrame): DataFrame =
    matchedDf.groupBy("database_id", "indicator_type", "role")
      .agg(count(lit(1)).as("match_count"))

  final case class RunConfig(
      buckets: Int = 64,
      resume: Boolean = false,
      runId: String = "run-0")

  /** Execute the scan end-to-end with fan-out sinks, clean sink, gold
    * counts, stats and per-partition lineage; resumable by conv_id bucket.
    *
    * Layout under `outDir`:
    *   matched/   parquet partitioned by (bucket, indicator_type)  (R4, S10)
    *   clean/     parquet partitioned by (bucket)                  (R4)
    *   gold_counts/  (A10)   stats/  (A1-A6)   metrics/  (lineage)
    *   _buckets_done/<bucket>  completion markers (checkpoint/resume)
    */
  def run(spark: SparkSession, turns: DataFrame, dbs: Seq[IntelDb],
      outDir: String, cfg: RunConfig = RunConfig()): Map[String, Long] = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    val donePath = new org.apache.hadoop.fs.Path(s"$outDir/_buckets_done")
    val doneBuckets: Set[Int] =
      if (cfg.resume && fs.exists(donePath))
        fs.listStatus(donePath).map(_.getPath.getName.toInt).toSet
      else Set.empty

    val withBucket = turns
      .withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(cfg.buckets)))
    val pending =
      if (doneBuckets.isEmpty) withBucket
      else withBucket.filter(!col("bucket").isInCollection(doneBuckets))

    // --- single pass: extract + enrich + fan-out write
    // (bucket kept on candidate rows for partitioned writes)
    val candsB = pending
      .select(col("bucket"), col("conv_id"), col("turn_idx"), col("role"),
        explode(GraftFunctions.extract_iocs(col("text"))).as("ioc"))
      .select(col("bucket"), col("conv_id"), col("turn_idx"), col("role"),
        col("ioc.*"))
    val matchedDf = candsB
      .withColumn("hit", explode(
        IntelLookupMulti.column(col("value"), col("indicator_type"), dbs)))
      .select((col("bucket") +: (CandidateCols.map(col) :+
        col("hit.db_idx").as("db_idx") :+
        col("hit.entry_idx").as("entry_idx") :+
        col("hit.prefix_len").as("prefix_len") :+
        col("hit.match_type").as("match_type"))): _*)
      .join(broadcast(intelMetaDf(spark, dbs)), Seq("db_idx", "entry_idx"),
        "inner")
      .drop("db_idx")
      .withColumn("cidr",
        when(col("match_type") === "ip",
          concat(col("value"), lit("/"), col("prefix_len"))))

    val writeMode =
      if (cfg.resume && doneBuckets.nonEmpty) SaveMode.Append
      else SaveMode.Overwrite
    matchedDf.write.mode(writeMode)
      .partitionBy("bucket", "indicator_type")
      .parquet(s"$outDir/matched")

    // --- clean sink: turns with zero matches across all dbs (left_anti)
    val matchedBack = spark.read.parquet(s"$outDir/matched")
    val matchedKeys = matchedBack.select("conv_id", "turn_idx").distinct()
    pending.join(matchedKeys, Seq("conv_id", "turn_idx"), "left_anti")
      .write.mode(writeMode).partitionBy("bucket").parquet(s"$outDir/clean")

    // --- aggregates (A10 gold + A1-A6 stats), computed over ALL buckets
    val gold = goldCounts(matchedBack)
    gold.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/gold_counts")

    val linesProcessed = withBucket.count()
    val totalBytes = withBucket
      .agg(sum(octet_length(col("text")))).as[Long].head()
    val candStats = candidates(withBucket)
      .groupBy("indicator_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val candidatesTested = candStats.values.sum
    val totalMatches = matchedBack.count()
    val linesWithMatches = matchedKeys.count()

    val stats: Map[String, Long] = Map(
      "lines_processed" -> linesProcessed,
      "total_bytes" -> totalBytes,
      "candidates_tested" -> candidatesTested,
      "total_matches" -> totalMatches,
      "lines_with_matches" -> linesWithMatches
    ) ++ candStats.map { case (k, v) => s"candidates_$k" -> v }
    stats.toSeq.toDF("stat", "value").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stats")

    // --- per-partition lineage metrics (R1/A7 analog): one row per input
    // partition of the candidate stage, written to the metrics table
    candsB.withColumn("partition_id", spark_partition_id())
      .groupBy("partition_id", "bucket")
      .agg(count(lit(1)).as("candidates"),
        countDistinct(col("conv_id"), col("turn_idx")).as("turns_with_candidates"))
      .withColumn("run_id", lit(cfg.runId))
      .write.mode(writeMode).parquet(s"$outDir/metrics")

    // --- completion markers (resume unit = bucket)
    fs.mkdirs(donePath)
    (0 until cfg.buckets).foreach { b =>
      fs.create(new org.apache.hadoop.fs.Path(s"$outDir/_buckets_done/$b"),
        true).close()
    }
    stats
  }
}
