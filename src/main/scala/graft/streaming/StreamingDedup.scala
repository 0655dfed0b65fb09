package graft.streaming

import graft.ops.TextStats
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming exact dedup over a document stream: the first document with a
  * given fingerprint (whitespace-normalized lowercase md5 —
  * TextStats.fingerprint, so formatting variants collapse) passes; every
  * later occurrence IN ANY micro-batch is dropped. This is the ingestion-
  * time form of exact dedup a continuously-fed training corpus needs —
  * batch dedup can't see across arrival boundaries, the keyed state can.
  *
  * State = one boolean per seen fingerprint, checkpointed (survives
  * restarts, so re-drains don't re-admit duplicates). Within a batch the
  * smallest doc_id of a fingerprint group is the survivor (deterministic).
  * State is unbounded by design in `start` (the seen-set IS the product);
  * `startTtl` is the bounded-state variant — fingerprints expire via an
  * EVENT-TIME timeout once the watermark passes admission + TTL, after
  * which the fingerprint is re-admitted (state size = fingerprints seen in
  * the last TTL window, the right trade for a continuous feed that can
  * tolerate slow re-admission).
  *
  * The per-batch output directories (deduped/batch=N) also accumulate over
  * a long-running deployment; a periodic compaction job (read deduped/,
  * rewrite into date-partitioned files, swap) keeps file counts bounded —
  * same pattern as any streaming parquet sink.
  */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  final case class Doc(doc_id: Long, text: String)

  def start(spark: SparkSession, inDir: String, outDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream.schema(docSchema).json(inDir)
    val keyed = stream
      .select(col("doc_id"), col("text"),
        TextStats.fingerprint(col("text")).as("fp"))
      .as[(Long, String, String)]
      .groupByKey(_._3)
    val kept = keyed.flatMapGroupsWithState[Boolean, Doc](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      case (_, rows, state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty // fingerprint seen in a prior batch
        else {
          state.update(true)
          // deterministic survivor within the batch: smallest doc_id
          var best: Doc = null
          rows.foreach { case (id, text, _) =>
            if (best == null || id < best.doc_id) best = Doc(id, text)
          }
          Iterator.single(best)
        }
    }
    kept.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint_dedup")
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        // idempotent under replay: a crash between the parquet write and
        // the checkpoint commit re-runs the SAME batchId, which overwrites
        // its own directory instead of appending duplicates — the one
        // failure mode a dedup sink must not have
        batch.write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/deduped/batch=$batchId")
        ()
      }
      .start()
  }

  val docTsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** Bounded-state streaming dedup: like `start`, but each fingerprint's
    * state expires `ttlMs` after its ADMISSION event time (not sliding —
    * later duplicates do not extend the window, so expiry is deterministic
    * and a duplicate flood cannot pin state forever). Expiry is an
    * event-time timeout against the watermark (EventTimeTimeout — safe
    * under AvailableNow drains, unlike ProcessingTimeTimeout which parks
    * them; see StreamingScan.conversationStateEventTime): once the
    * watermark passes admission + TTL the state row is dropped and the
    * next occurrence of that fingerprint is re-admitted.
    *
    * State size = fingerprints admitted within the trailing TTL window.
    * Rows with null ts are dropped (they can neither advance nor respect
    * the watermark).
    */
  def startTtl(spark: SparkSession, inDir: String, outDir: String,
      ttlMs: Long = 60000L, watermarkDelay: String = "10 seconds",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream.schema(docTsSchema).json(inDir)
    val keyed = stream
      .where(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("text"), col("ts"),
        TextStats.fingerprint(col("text")).as("fp"))
      .as[(Long, String, java.sql.Timestamp, String)]
      .groupByKey(_._4)
    // state = admission event-time millis (for the fixed expiry anchor)
    val kept = keyed.flatMapGroupsWithState[Long, Doc](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      case (_, rows, state: GroupState[Long]) =>
        // a state whose TTL the watermark has already passed is expired
        // even if Spark hasn't fired its timeout yet: data for a key
        // arriving in the SAME batch that advances the watermark past
        // expiry suppresses hasTimedOut for that invocation, and the
        // occurrence must be re-admitted, not dropped
        val expired = state.exists &&
          state.get + ttlMs <= state.getCurrentWatermarkMs()
        if (state.hasTimedOut) { // TTL passed the watermark: forget
          state.remove()
          Iterator.empty
        } else if (state.exists && !expired) {
          // duplicate within the TTL window: drop; do NOT slide the window
          // — but RE-ARM the timeout at the original admission anchor:
          // Spark clears a group's timeout on every function invocation,
          // so skipping this would let a duplicate pin the state forever
          state.setTimeoutTimestamp(
            math.max(state.get + ttlMs, state.getCurrentWatermarkMs() + 1))
          Iterator.empty
        } else {
          var best: Doc = null
          var admitTs = Long.MaxValue
          rows.foreach { case (id, text, ts, _) =>
            if (best == null || id < best.doc_id) best = Doc(id, text)
            if (ts.getTime < admitTs) admitTs = ts.getTime
          }
          state.update(admitTs)
          // a timeout in the past (late-but-allowed data) would throw —
          // clamp to just past the current watermark (expires next batch)
          state.setTimeoutTimestamp(
            math.max(admitTs + ttlMs, state.getCurrentWatermarkMs() + 1))
          Iterator.single(best)
        }
    }
    kept.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint_dedup_ttl")
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        batch.write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/deduped/batch=$batchId")
        ()
      }
      .start()
  }
}
