package graft.streaming

import graft.intel.IntelDb
import graft.pipeline.ScanJob
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming variant of the scan job — the follow/tail -f analog (S4,
  * bin/match_processor/follow.rs): a Structured Streaming file source over
  * an append directory of transcript files; each micro-batch reuses the
  * batch pipeline via foreachBatch (which also re-resolves the intel set —
  * the hot-reload analog L9: pass a supplier and the freshest broadcast is
  * used per batch). Graceful stop = query.stop(); exactly-once sink via the
  * checkpoint dir.
  */
object StreamingScan {

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** Start a streaming scan over `inDir` (json-lines turn files), writing
    * matched rows to `outDir/matched_stream`. `dbsSupplier` is re-invoked
    * every micro-batch (hot reload).
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      dbsSupplier: () => Seq[IntelDb],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = spark.readStream
      .schema(turnSchema)
      .json(inDir)
    stream.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dbs = dbsSupplier()
        ScanJob.matched(batch, dbs, spark)
          .write.mode(SaveMode.Append)
          .partitionBy("indicator_type")
          .parquet(s"$outDir/matched_stream")
        ()
      }
      .start()
  }
}
