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
  * here alike — the read is inherently one-threaded. Driver memory is
  * BOUNDED: inputs up to `spoolChunkLines` are parallelized directly
  * (the common CLI case), anything larger is spooled to parquet one chunk
  * at a time and read back as an ordinary distributed scan, so a multi-GB
  * `cat logs |` never materializes on the driver (round-5 fix — the
  * previous all-lines `toArray` was an unbounded driver allocation). For
  * unbounded continuous input use `streaming.StreamingScan` (file-source
  * follow mode) instead, which is the scalable analog of
  * `tail -f | matchy match -`.
  */
object StdinSource {

  /** Default spool threshold/chunk: 1M lines ≈ low hundreds of MB of
    * driver strings at typical log-line lengths — safely inside the 16g
    * driver heap while keeping small pipes zero-IO.
    */
  val DefaultSpoolChunkLines: Int = 1 << 20

  /** Read all lines from `in` (default: real stdin) into the transcript
    * shape. `conv_id` is the source label, `turn_idx` the 0-based line
    * number, `ts` the arrival stamp (one stamp for the batch, like the
    * reference's per-run clock; injectable for deterministic tests).
    *
    * `turn_idx` is int32 by the transcript contract; a pipe beyond
    * 2^31-1 lines fails loudly rather than wrapping.
    */
  def readTurns(
      spark: SparkSession,
      in: InputStream = System.in,
      sourceLabel: String = "stdin",
      tsMillis: Option[Long] = None,
      slices: Int = 0,
      spoolChunkLines: Int = DefaultSpoolChunkLines,
      spoolDir: Option[String] = None): DataFrame = {
    require(spoolChunkLines > 0, s"spoolChunkLines: $spoolChunkLines")
    val reader = new BufferedReader(
      new InputStreamReader(in, StandardCharsets.UTF_8))
    val stamp = new Timestamp(tsMillis.getOrElse(System.currentTimeMillis()))
    import spark.implicits._

    def readChunk(): Array[String] = {
      val buf = new scala.collection.mutable.ArrayBuffer[String]
      var line = reader.readLine()
      while (line != null && buf.length < spoolChunkLines) {
        buf += line
        if (buf.length < spoolChunkLines) line = reader.readLine()
        else line = null
      }
      buf.toArray
    }
    def turnsOf(lines: Array[String], base: Long): IndexedSeq[Turn] = {
      require(base + lines.length <= Int.MaxValue,
        s"stdin exceeds ${Int.MaxValue} lines — turn_idx is int32 by the " +
          "transcript contract; split the input or use StreamingScan")
      lines.zipWithIndex.map { case (line, i) =>
        Turn(sourceLabel, (base + i).toInt, "stdin", line, tool = null,
          ts = stamp)
      }.toIndexedSeq
    }
    def slicesFor(n: Long): Int =
      if (slices > 0) slices
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (n / 1000 + 1).toInt))

    val first = readChunk()
    if (first.length < spoolChunkLines) {
      // small pipe (the common CLI case): straight to executors, no IO
      spark.createDataset(spark.sparkContext.parallelize(
        turnsOf(first, 0L), slicesFor(first.length.toLong))).toDF()
    } else {
      // large pipe: spool chunk-by-chunk so driver residency is one chunk
      val dir = spoolDir.getOrElse {
        val d = java.nio.file.Files.createTempDirectory("graft-stdin-spool")
        d.toFile.deleteOnExit()
        d.toString
      }
      var base = 0L
      var chunk = first
      while (chunk.nonEmpty) {
        spark.createDataset(spark.sparkContext.parallelize(
          turnsOf(chunk, base), slicesFor(spoolChunkLines.toLong)))
          .write.mode("append").parquet(dir)
        base += chunk.length
        chunk = if (chunk.length == spoolChunkLines) readChunk()
          else Array.empty[String]
      }
      // one distributed scan over the spool; column order = Turn contract
      spark.read.parquet(dir)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    }
  }
}
