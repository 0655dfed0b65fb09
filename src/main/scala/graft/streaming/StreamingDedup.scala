package graft.streaming

import graft.ops.TextStats
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
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
  * a long-running deployment; [[SinkCompaction.compact]] folds the
  * committed directories into one right-sized directory (crash-recoverable
  * swap, newest batch spared as the replay guard) — run it periodically
  * while the query is stopped.
  */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  final case class Doc(doc_id: Long, text: String)

  def start(spark: SparkSession, inDir: String, outDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    // doc_id.isNotNull: a malformed JSON line yields an all-null row
    // (PERMISSIVE mode), and deserializing a null into the primitive Long
    // of the typed tuple kills the query PERMANENTLY (restart re-reads the
    // same file — a one-line poison pill for a continuous pipeline)
    val stream = spark.readStream.schema(docSchema).json(inDir)
      .where(col("doc_id").isNotNull)
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
    // doc_id guard: see the non-TTL variant — null doc_id is a poison pill
    val stream = spark.readStream.schema(docTsSchema).json(inDir)
      .where(col("doc_id").isNotNull)
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

  /** One doc's vote from one LSH band bucket (internal to startNearDup). */
  final case class BandVote(doc_id: Long, text: String, dup: Boolean)

  /** Streaming NEAR-dup dedup: MinHash-LSH band buckets as keyed state.
    *
    * Semantics — the streaming analog of batch
    * `nearDupClusters(keep canonical)`: each doc claims its `bands` LSH
    * buckets (`Dedup.bandedMinhash` banding, identical to the batch
    * `minhashLshPairs` keys, so the two agree on what "near" means); a doc
    * is KEPT iff every one of its buckets was unclaimed at arrival
    * (within a batch, the smallest doc_id in a fresh bucket wins it).
    * Claims made by docs that are themselves dropped still stand — that is
    * deliberate, not a leak: if X shares a bucket with dropped Y, then
    * X~Y is a band-collision edge and Y~(its dropper) another, so X is in
    * the same connected component and batch CC would drop it too. Keep set
    * = one representative (first-arrival) per component of the
    * band-collision graph, built incrementally with O(1) state per bucket.
    *
    * 100 TB shape: state is one boolean per DISTINCT band bucket — the
    * streaming twin of the batch band join's left side, sharded by Spark's
    * state-store partitioning; no signature matrix is ever held. A
    * duplicate flood lands in already-claimed buckets and costs one state
    * probe per band, the streaming equivalent of the batch `maxBandDf`
    * cap. Unbounded by design like `start` (the claim set IS the dedup
    * product); `startNearDupTtl` is the bounded-state variant.
    *
    * The per-doc "all bands clean" fold is BATCH-LOCAL (a doc's band rows
    * all come from the same input row, hence the same micro-batch), so it
    * runs inside foreachBatch rather than as a second stateful operator.
    */
  /** LSH band rows PLUS one per-doc "solo" bucket row for documents too
    * short to shingle (< k tokens). `Dedup.bandedMinhash` drops such docs
    * from banding (correct for batch pair generation — they cannot be
    * near-dup candidates), but the streaming claim fold only emits docs
    * that produced at least one band row, so without the solo row a short
    * document would be silently ABSENT from the deduped output — neither
    * kept nor marked dup. The solo bucket key is unique per doc_id, so a
    * short doc always wins its own bucket and is kept (vacuously: no
    * shingles, no near-dups); an exact replay of the same doc_id finds the
    * bucket claimed and drops, which is the idempotency the sink wants.
    */
  private def bandedWithSolo(df: DataFrame, k: Int, numHashes: Int,
      bands: Int, keep: Seq[String]): DataFrame = {
    val banded = graft.ops.Dedup
      .bandedMinhash(df, "text", k, numHashes, bands, keep)
    val solo = df
      // coalesce: size(tokens(null text)) is NULL in Spark 4, and a NULL
      // predicate would drop a null-text doc from BOTH the banded and the
      // solo side — silently absent from the deduped output, the exact
      // invariant this solo row exists to prevent (exact dedup keeps the
      // first null-text doc; near-dup must too)
      .where(coalesce(
        size(graft.ops.Decontaminate.tokens(col("text"))), lit(0)) < k)
      .select(keep.map(col) :+ lit(-1).as("band_idx") :+
        concat(lit("solo:"), col("doc_id")).as("band_key"): _*)
    banded.unionByName(solo)
  }

  def startNearDup(spark: SparkSession, inDir: String, outDir: String,
      k: Int = 5, numHashes: Int = 8, bands: Int = 4,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    // doc_id.isNotNull: a malformed JSON line yields an all-null row
    // (PERMISSIVE mode), and deserializing a null into the primitive Long
    // of the typed tuple kills the query PERMANENTLY (restart re-reads the
    // same file — a one-line poison pill for a continuous pipeline)
    val stream = spark.readStream.schema(docSchema).json(inDir)
      .where(col("doc_id").isNotNull)
    val banded = bandedWithSolo(stream, k, numHashes, bands,
      keep = Seq("doc_id", "text"))
      .select(col("doc_id"), col("text"),
        concat_ws("|", col("band_idx"), col("band_key")).as("bucket"))
      .as[(Long, String, String)]
    val votes = banded.groupByKey(_._3)
      .flatMapGroupsWithState[Boolean, BandVote](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Boolean]) =>
          // one bucket's docs within this batch; buffered to find the
          // winner before emitting (bounded by batch x bucket, and floods
          // concentrate in ALREADY-claimed buckets where no buffer forms
          // beyond the rows Spark already grouped)
          val ds = rows.toArray
          val claimed = state.exists
          state.update(true)
          if (claimed) ds.iterator.map(d => BandVote(d._1, d._2, dup = true))
          else {
            var minId = Long.MaxValue
            ds.foreach(d => if (d._1 < minId) minId = d._1)
            ds.iterator.map(d => BandVote(d._1, d._2, dup = d._1 != minId))
          }
      }
    votes.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint_neardup")
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .foreachBatch(writeKeptVotes(outDir) _)
      .start()
  }

  /** Bounded-state streaming near-dup: `startNearDup` with `startTtl`'s
    * expiry semantics applied per LSH band bucket. A bucket's claim
    * expires `ttlMs` after its ADMISSION event time (fixed anchor — later
    * collisions do not slide the window, so a near-duplicate flood cannot
    * pin a bucket forever); once the watermark passes admission + TTL the
    * claim is dropped and the next document landing in that bucket
    * re-claims it (slow re-admission, the continuous-feed trade).
    *
    * State size = DISTINCT band buckets claimed within the trailing TTL
    * window — the bounded form of `startNearDup`'s claim set. A document
    * whose buckets are PARTLY expired still re-claims the expired ones
    * even when an unexpired bucket drops the document itself — claims by
    * dropped documents are transitive edges of the band-collision graph,
    * exactly as in the unbounded variant. Rows with null ts are dropped.
    */
  def startNearDupTtl(spark: SparkSession, inDir: String, outDir: String,
      k: Int = 5, numHashes: Int = 8, bands: Int = 4,
      ttlMs: Long = 60000L, watermarkDelay: String = "10 seconds",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    // doc_id guard: see the non-TTL variant — null doc_id is a poison pill
    val stream = spark.readStream.schema(docTsSchema).json(inDir)
      .where(col("doc_id").isNotNull)
    val banded = bandedWithSolo(
      stream.where(col("ts").isNotNull).withWatermark("ts", watermarkDelay),
      k, numHashes, bands, keep = Seq("doc_id", "text", "ts"))
      .select(col("doc_id"), col("text"), col("ts"),
        concat_ws("|", col("band_idx"), col("band_key")).as("bucket"))
      .as[(Long, String, java.sql.Timestamp, String)]
    // state = the bucket claim's admission event-time millis
    val votes = banded.groupByKey(_._4)
      .flatMapGroupsWithState[Long, BandVote](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[Long]) =>
          // same watermark-vs-anchor subtleties as startTtl: an expiry the
          // watermark has passed counts even if the timeout hasn't fired,
          // and every invocation must re-arm the timeout at the ORIGINAL
          // admission anchor (Spark clears it per invocation)
          val expired = state.exists &&
            state.get + ttlMs <= state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists && !expired) {
            state.setTimeoutTimestamp(
              math.max(state.get + ttlMs, state.getCurrentWatermarkMs() + 1))
            rows.map(d => BandVote(d._1, d._2, dup = true))
          } else {
            val ds = rows.toArray
            var minId = Long.MaxValue
            var admitTs = Long.MaxValue
            ds.foreach { d =>
              if (d._1 < minId) minId = d._1
              if (d._3.getTime < admitTs) admitTs = d._3.getTime
            }
            state.update(admitTs)
            state.setTimeoutTimestamp(
              math.max(admitTs + ttlMs, state.getCurrentWatermarkMs() + 1))
            ds.iterator.map(d => BandVote(d._1, d._2, dup = d._1 != minId))
          }
      }
    votes.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint_neardup_ttl")
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .foreachBatch(writeKeptVotes(outDir) _)
      .start()
  }

  /** Shared near-dup sink: batch-local "all bands clean" fold, idempotent
    * per-batch overwrite (see `start`'s replay note).
    */
  private def writeKeptVotes(outDir: String)(
      batch: Dataset[BandVote], batchId: Long): Unit = {
    batch.groupBy(col("doc_id"))
      .agg(first(col("text")).as("text"),
        max(col("dup").cast("int")).as("any_dup"))
      .where(col("any_dup") === 0)
      .select(col("doc_id"), col("text"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/deduped/batch=$batchId")
    ()
  }
}
