package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming as-of enrichment — the ingestion-time analog of
  * [[graft.ops.AsofJoin]] (which replays history in batch): a probe
  * stream (events) and a build stream (state updates) share a key; each
  * probe is enriched with the most recent build at or before its EVENT
  * time, among everything that has ARRIVED so far. This is the Flink
  * "temporal table join" shape on Structured Streaming keyed state.
  *
  * State = ONE row per key (the latest build by (ts, bid)), checkpointed
  * — O(keys), never O(history). The bounded state is an explicit trade:
  *  - within a micro-batch, event-time order is exact (a probe sees the
  *    batch's builds at-or-before its ts plus the carried state, best
  *    (ts, bid) wins — same tie rule as the batch op);
  *  - across batches, a LATE probe older than the carried state's ts
  *    gets NULL rather than silently-wrong newer state ("null over
  *    wrong"); replaying exact history for stragglers is the batch op's
  *    job.
  * Rows with NULL key/ts/id are dropped at ingest: a malformed JSON line
  * yields an all-null row (PERMISSIVE mode) and a null into a primitive
  * Long kills the query permanently on every restart — the
  * StreamingDedup poison-pill rule.
  *
  * Output parquet per micro-batch (enriched/batch=N, overwrite = replay-
  * idempotent, the StreamingDedup sink rule); compact periodically with
  * [[SinkCompaction.compact]].
  */
object StreamingAsof {

  val probeSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("k", LongType),
    StructField("ts", TimestampType)))

  val buildSchema: StructType = StructType(Seq(
    StructField("bid", LongType),
    StructField("k", LongType),
    StructField("ts", TimestampType),
    StructField("v", StringType)))

  final case class Enriched(event_id: Long, k: Long, ts_micros: Long,
      bid: Option[Long], v: Option[String])

  /** Latest build for a key: (event-time micros, tie id, payload). */
  final case class BuildState(tsMicros: Long, bid: Long, v: String)

  // (side 0=probe 1=build, k, tsMicros, id, payload)
  private type Tagged = (Int, Long, Long, Long, String)

  /** (ts, bid) lexicographic "strictly later than". */
  private def laterThan(a: BuildState, b: BuildState): Boolean =
    a.tsMicros > b.tsMicros || (a.tsMicros == b.tsMicros && a.bid > b.bid)

  def start(spark: SparkSession, probeDir: String, buildDir: String,
      outDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val probes = spark.readStream.schema(probeSchema).json(probeDir)
      .where(col("event_id").isNotNull && col("k").isNotNull &&
        col("ts").isNotNull)
      .select(lit(0).as("side"), col("k"), unix_micros(col("ts")).as("tsu"),
        col("event_id").as("id"), lit(null).cast("string").as("payload"))
    val builds = spark.readStream.schema(buildSchema).json(buildDir)
      .where(col("bid").isNotNull && col("k").isNotNull &&
        col("ts").isNotNull)
      .select(lit(1).as("side"), col("k"), unix_micros(col("ts")).as("tsu"),
        col("bid").as("id"),
        // v may legitimately be null; carry through as-is
        col("v").as("payload"))
    // side codes only tag rows INSIDE this op (0=probe, 1=build here —
    // unrelated to AsofJoin's window tag)
    val tagged = probes.unionByName(builds).as[Tagged].groupByKey(_._2)

    val enriched = tagged.flatMapGroupsWithState[BuildState, Enriched](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      case (key, rows, state: GroupState[BuildState]) =>
        // batch builds sorted by (ts, bid): binary-search target per probe
        val all = rows.toArray
        val batchBuilds = all.collect {
          case (1, _, tsu, id, v) => BuildState(tsu, id, v)
        }.sortBy(b => (b.tsMicros, b.bid))
        val carried = state.getOption.orNull

        def bestAtOrBefore(tsu: Long): BuildState = {
          // last batch build with tsMicros <= tsu
          var lo = 0; var hi = batchBuilds.length - 1; var found = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (batchBuilds(mid).tsMicros <= tsu) { found = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          val fromBatch = if (found >= 0) batchBuilds(found) else null
          val fromState =
            if (carried != null && carried.tsMicros <= tsu) carried else null
          (fromBatch, fromState) match {
            case (null, s) => s
            case (b, null) => b
            case (b, s) => if (laterThan(s, b)) s else b
          }
        }

        val out = new ArrayBuffer[Enriched](all.length)
        all.foreach {
          case (0, _, tsu, id, _) =>
            val b = bestAtOrBefore(tsu)
            out += (if (b == null) Enriched(id, key, tsu, None, None)
              else Enriched(id, key, tsu, Some(b.bid), Option(b.v)))
          case _ => ()
        }
        // advance the carried state to the overall latest build
        if (batchBuilds.nonEmpty) {
          val newest = batchBuilds.last
          if (carried == null || laterThan(newest, carried))
            state.update(newest)
        }
        out.iterator
    }

    enriched.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint_asof")
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Enriched], batchId: Long) =>
        batch.write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/enriched/batch=$batchId")
        ()
      }
      .start()
  }
}
