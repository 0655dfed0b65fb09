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
  * State is unbounded by design here (the seen-set IS the product); a
  * deployment that can tolerate re-admission after idleness would add an
  * event-time timeout exactly like conversationStateEventTime.
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
}
