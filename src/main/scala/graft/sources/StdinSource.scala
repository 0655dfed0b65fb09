package graft.sources

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3: stdin source — the reference's `-` input path
  * (bin/match_processor/sequential.rs:27-35 reads stdin line-by-line and
  * feeds each line through extract/match).
  *
  * Semantics here are identical: each stdin LINE becomes one turn-shaped
  * row (`text` = the line), so every downstream operator — `extract_iocs`,
  * `ScanJob.run`, the NDJSON sink — works on piped input unchanged
  * (`cat logs | spark-submit ... --turns -`).
  *
  * Scale note: a pipe is a single sequential stream in the reference and
  * here alike — the read is inherently one-threaded. The rows are sliced
  * across `slices` partitions afterwards so everything downstream runs at
  * full parallelism; for unbounded continuous input use
  * `streaming.StreamingScan` (file-source follow mode) instead, which is
  * the scalable analog of `tail -f | matchy match -`.
  */
object StdinSource {

  /** Read all lines from `in` (default: real stdin) into the transcript
    * shape. `conv_id` is the source label, `turn_idx` the 0-based line
    * number, `ts` the arrival stamp (one stamp for the batch, like the
    * reference's per-run clock; injectable for deterministic tests).
    */
  def readTurns(
      spark: SparkSession,
      in: InputStream = System.in,
      sourceLabel: String = "stdin",
      tsMillis: Option[Long] = None,
      slices: Int = 0): DataFrame = {
    val reader = new BufferedReader(
      new InputStreamReader(in, StandardCharsets.UTF_8))
    val lines = Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .toArray
    val stamp = new Timestamp(tsMillis.getOrElse(System.currentTimeMillis()))
    val turns = lines.zipWithIndex.map { case (line, i) =>
      Turn(sourceLabel, i, "stdin", line, tool = null, ts = stamp)
    }
    val n =
      if (slices > 0) slices
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        turns.length / 1000 + 1))
    import spark.implicits._
    spark.createDataset(
      spark.sparkContext.parallelize(turns.toIndexedSeq, n)).toDF()
  }
}
