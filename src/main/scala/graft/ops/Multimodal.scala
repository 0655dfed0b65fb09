package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The DECODE step is a clearly-marked deterministic STUB (this container
  * has no image/audio codecs) — what is real and tested is the Spark-side
  * contract: binary schema, metadata struct, batch iteration shape
  * (mapPartitions over a typed Dataset — the Scala analog of mapInPandas
  * batches), partition sizing, and frame sampling arithmetic.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int)
  final case class Frame(media_id: Long, frame_idx: Int, offset: Int,
      frame_bytes: Array[Byte])

  /** Synthesize a deterministic media table: payload bytes are a pure
    * function of media_id; the first 8 bytes are a fake header carrying
    * (width, height) as big-endian u16 pairs — the stand-in for a real
    * container header.
    */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 256 + (graft.pipeline.Fixtures.mix(i) & 0x3ff).toInt
      val payload = new Array[Byte](len)
      val w = 16 + (i % 64).toInt
      val h = 16 + (i % 48).toInt
      payload(0) = (w >> 8).toByte; payload(1) = w.toByte
      payload(2) = (h >> 8).toByte; payload(3) = h.toByte
      var j = 4
      while (j < len) {
        payload(j) = graft.pipeline.Fixtures.mix(i * 1000L + j).toByte
        j += 1
      }
      MediaRow(i, kind, payload)
    }
  }

  /** STUB decode: parse the fake header into typed metadata. A real
    * implementation would hand each partition's batch to a codec; the
    * batching/partitioning shape here is the real contract.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup cost amortized over the batch (codec init here)
      batch.map { m =>
        val w = ((m.payload(0) & 0xff) << 8) | (m.payload(1) & 0xff)
        val h = ((m.payload(2) & 0xff) << 8) | (m.payload(3) & 0xff)
        val frames =
          if (m.kind == "video") math.max(1, (m.payload.length - 8) / 64)
          else 1
        MediaMeta(m.media_id, m.kind, m.payload.length, w, h, frames)
      }
    }
  }

  /** Frame sampling: every `stride`-th 64-byte block of a video payload —
    * the Spark-side shape of frame extraction (offset arithmetic + slice),
    * with the actual pixel decode stubbed.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nBlocks = math.max(1, (m.payload.length - 8) / 64)
      (0 until nBlocks by stride).map { f =>
        val off = 8 + f * 64
        Frame(m.media_id, f, off,
          java.util.Arrays.copyOfRange(m.payload, off,
            math.min(off + 64, m.payload.length)))
      }
    }
  }

  /** DataFrame view with metadata attached — the shape a downstream
    * training-data pipeline consumes (binary + struct metadata columns).
    */
  def withMeta(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    val meta = decodeMeta(media)
    media.toDF().join(meta.toDF().drop("kind"), Seq("media_id"))
      .withColumn("meta",
        struct(col("byte_len"), col("width"), col("height"), col("n_frames")))
      .select("media_id", "kind", "payload", "meta")
  }
}
