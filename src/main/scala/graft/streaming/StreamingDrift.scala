package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming CUSUM drift alarms — the live analog of
  * [[graft.ops.ChangePoint.cusum]] (which replays a finished series in
  * batch): Page's one-sided test `S = max(0, S + x − drift)`, alarm at
  * `S ≥ threshold`, folded INCREMENTALLY over a stream of per-(key,
  * period) counts — the metering stream a telemetry bus already emits
  * (e.g. the output of the sliding-window aggregation job). This is the
  * op an on-call rotation actually runs: the batch detector tells you a
  * campaign started last Tuesday; this one pages while it ramps.
  *
  * State = TWO longs per key (the last folded period, the running S) —
  * O(keys), never O(history) — and the fold is the exact integer
  * recurrence of the batch op, so the parity claim is sharp: for a
  * series whose periods arrive in STRICTLY increasing order per key
  * (however it is SPLIT across micro-batches), the emitted
  * (cusum, alarm) per row equals [[graft.ops.ChangePoint.cusum]] over
  * the concatenated series, bit for bit (spec-replayed). Within a
  * micro-batch rows fold in the batch op's (period, value) sort order;
  * like the batch op, absent periods are NOT zero-filled — the fold
  * consumes the rows that exist.
  *
  * Late rows — a period at or BEFORE one already folded — cannot be
  * folded without rewriting history, so they take the
  * [[StreamingAsof]] "null over wrong" rule: emitted with
  * `late = true` and NULL cusum/alarm (an audit row, never a wrong
  * statistic); the batch op is the replay path for exactness over
  * stragglers. A duplicate of an already-folded period is late BY
  * DEFINITION (here the two ops differ: the batch replay folds every
  * row it is given, duplicates included — a metering bus emitting a
  * second count for a period it already reported is issuing a
  * correction, and corrections are replays, not increments). Rows with NULL key/period are dropped at ingest (the
  * StreamingDedup poison-pill rule: a malformed JSON line yields
  * all-null rows and a null into a primitive Long kills the query on
  * every restart); NULL values count 0, the batch op's coalesce.
  *
  * Output parquet per micro-batch (`alarms/batch=N`, overwrite =
  * replay-idempotent, the StreamingDedup sink rule); compact
  * periodically with [[SinkCompaction.compact]].
  */
object StreamingDrift {

  val inputSchema: StructType = StructType(Seq(
    StructField("k", StringType),
    StructField("period", LongType),
    StructField("value", LongType)))

  final case class DriftRow(key: String, period: Long, value: Long,
      cusum: Option[Long], alarm: Option[Boolean], late: Boolean)

  /** Carried fold state: last folded period + the running statistic. */
  final case class CusumState(lastPeriod: Long, stat: Long)

  def start(spark: SparkSession, inDir: String, outDir: String,
      drift: Long, threshold: Long,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(threshold > 0, "threshold must be positive")
    import spark.implicits._
    val counts = spark.readStream.schema(inputSchema).json(inDir)
      .where(col("k").isNotNull && col("period").isNotNull)
      .select(col("k"), col("period"),
        coalesce(col("value"), lit(0L)).as("value"))
      .as[(String, Long, Long)]

    val folded = counts.groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, DriftRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[CusumState]) =>
          // the batch op's in-batch total order: (period, value)
          val sorted = rows.toArray.sortBy(r => (r._2, r._3))
          var last = state.getOption.map(_.lastPeriod).getOrElse(Long.MinValue)
          var stat = state.getOption.map(_.stat).getOrElse(0L)
          val out = new ArrayBuffer[DriftRow](sorted.length)
          sorted.foreach { case (_, period, v) =>
            if (period <= last) // already folded: audit row, never rewrite
              out += DriftRow(key, period, v, None, None, late = true)
            else {
              stat = math.max(0L, stat + v - drift)
              last = period
              out += DriftRow(key, period, v, Some(stat),
                Some(stat >= threshold), late = false)
            }
          }
          if (sorted.nonEmpty) state.update(CusumState(last, stat))
          out.iterator
      }

    folded.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint_drift")
      .trigger(trigger)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[DriftRow], batchId: Long) =>
        batch.write.mode(SaveMode.Overwrite)
          .parquet(s"$outDir/alarms/batch=$batchId")
        ()
      }
      .start()
  }
}
