package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * Two decode paths:
  *  - REAL: pure-JVM 24-bit BMP and PCM-16 WAV codecs (MediaCodecs, round
  *    2) plus JPEG/PNG/GIF through the JDK's ImageIO (round 3 — no native
  *    deps) drive synthesizeReal/decodeFeatures/resizeImages — decode,
  *    feature-extract and resize are actual byte-level work inside the
  *    same mapPartitions batching contract. The `video` kind has a real
  *    multi-frame path too (round 4): animated GIF via ImageIO —
  *    frames -> per-channel features (decodeFeatures) and strided frame
  *    extraction (sampleVideoFrames);
  *  - STUB (container video: mp4/webm decode needs native codecs this
  *    environment lacks): decodeMeta parses a fake header; the
  *    batching/partitioning shape is identical.
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
  /** Header parse of one row — shared by [[decodeMeta]] and [[withMeta]].
    * Route, never die: a null or <4-byte payload (truncated upload) has no
    * parsable header — emit the zero-dimension meta row the downstream
    * filters treat as undecodable, like decodeFeatures.
    */
  private def metaOf(m: MediaRow): MediaMeta =
    if (m.payload == null || m.payload.length < 4)
      MediaMeta(m.media_id, m.kind,
        if (m.payload == null) 0 else m.payload.length, 0, 0, 0)
    else {
      val w = ((m.payload(0) & 0xff) << 8) | (m.payload(1) & 0xff)
      val h = ((m.payload(2) & 0xff) << 8) | (m.payload(3) & 0xff)
      val frames =
        if (m.kind == "video") math.max(1, (m.payload.length - 8) / 64)
        else 1
      MediaMeta(m.media_id, m.kind, m.payload.length, w, h, frames)
    }

  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    // per-partition setup cost amortized over the batch (codec init here)
    media.mapPartitions(_.map(metaOf))
  }

  /** Frame sampling: every `stride`-th 64-byte block of a video payload —
    * the Spark-side shape of frame extraction (offset arithmetic + slice),
    * with the actual pixel decode stubbed.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    // driver-side fail-fast: `by 0` throws per row inside executor tasks
    require(stride > 0, s"stride must be positive: $stride")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      if (m.payload == null || m.payload.length <= 8) Seq.empty
      else {
        val nBlocks = math.max(1, (m.payload.length - 8) / 64)
        (0 until nBlocks by stride).map { f =>
          val off = 8 + f * 64
          Frame(m.media_id, f, off,
            java.util.Arrays.copyOfRange(m.payload, off,
              math.min(off + 64, m.payload.length)))
        }
      }
    }
  }

  // ---------------------------------------------------- REAL codec path
  final case class MediaFeatures(media_id: Long, kind: String,
      decoded: Boolean, width: Int, height: Int,
      mean_b_milli: Long, mean_g_milli: Long, mean_r_milli: Long,
      channels: Int, sample_rate: Int, n_samples: Int, rms_milli: Long,
      // video only: decoded frame count (0 for image/audio)
      n_frames: Int = 0)

  /** Synthesize REAL media payloads: valid 24-bit BMPs, PNGs and JPEGs
    * (kind=image, rotating by row so all three decode paths are exercised)
    * and PCM-16 WAVs (kind=audio), pixel/sample content a pure function of
    * media_id. Every third row is a deliberately corrupt payload
    * (kind=image, truncated header) — the pipeline must route it, not die.
    */
  def synthesizeReal(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      (i % 3) match {
        case 0 =>
          val w = 8 + (i % 24).toInt
          val h = 8 + (i % 16).toInt
          val px = new Array[Byte](w * h * 3)
          var j = 0
          while (j < px.length) {
            px(j) = graft.pipeline.Fixtures.mix(i * 7919L + j).toByte
            j += 1
          }
          val bmp = MediaCodecs.Bmp(w, h, px)
          val payload = ((i / 3) % 3) match {
            case 0 => MediaCodecs.encodeBmp(bmp)
            case 1 => MediaCodecs.encodeJvmImage(bmp, "png")
            case _ => MediaCodecs.encodeJvmImage(bmp, "jpg")
          }
          MediaRow(i, "image", payload)
        case 1 =>
          val nSamp = 64 + (i % 200).toInt * 2
          val samples = new Array[Short](nSamp)
          var j = 0
          while (j < nSamp) {
            samples(j) = (graft.pipeline.Fixtures.mix(i * 104729L + j) & 0x7ff)
              .toShort
            j += 1
          }
          MediaRow(i, "audio",
            MediaCodecs.encodeWav(MediaCodecs.Wav(1, 16000, samples)))
        case _ =>
          MediaRow(i, "image", Array[Byte]('B', 'M', 0, 1, 2)) // corrupt
      }
    }
  }

  /** REAL decode + feature extraction in partition batches: BMP -> size and
    * mean channel features, WAV -> rate/length/RMS. Undecodable payloads
    * come back with decoded=false (routed, never thrown).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        m.kind match {
          case "image" =>
            // BMP fast path, else ImageIO (JPEG/PNG/GIF) — real corpus
            // formats decode pure-JVM; anything else routes as undecoded
            val img = MediaCodecs.decodeAnyImage(m.payload)
            if (img == null)
              MediaFeatures(m.media_id, m.kind, decoded = false,
                0, 0, 0, 0, 0, 0, 0, 0, 0)
            else {
              val (b, g, r) = MediaCodecs.bmpMeanBgrMilli(img)
              MediaFeatures(m.media_id, m.kind, decoded = true,
                img.width, img.height, b, g, r, 0, 0, 0, 0)
            }
          case "audio" =>
            val wav = MediaCodecs.decodeWav(m.payload)
            if (wav == null)
              MediaFeatures(m.media_id, m.kind, decoded = false,
                0, 0, 0, 0, 0, 0, 0, 0, 0)
            else
              MediaFeatures(m.media_id, m.kind, decoded = true, 0, 0, 0, 0, 0,
                wav.channels, wav.sampleRate, wav.samples.length,
                MediaCodecs.wavRmsMilli(wav))
          case "video" =>
            // animated GIF: the pure-JVM multi-frame path (container
            // formats like mp4 need native codecs — documented stub,
            // routed as undecoded like any other unreadable payload)
            val frames = MediaCodecs.decodeGifFrames(m.payload)
            if (frames == null)
              MediaFeatures(m.media_id, m.kind, decoded = false,
                0, 0, 0, 0, 0, 0, 0, 0, 0)
            else {
              // per-channel mean over ALL frames (mean of frame means
              // would skew if frame sizes differed)
              var b = 0L; var g = 0L; var r = 0L; var n = 0L
              frames.foreach { f =>
                val (fb, fg, fr) = MediaCodecs.bmpMeanBgrMilli(f)
                val fn = (f.pixels.length / 3).toLong
                b += fb * fn; g += fg * fn; r += fr * fn; n += fn
              }
              // a malformed GIF whose frames all decode to ZERO pixels
              // (0-width/height descriptors) must route as undecoded —
              // b / 0 would throw in the task and kill the job, the one
              // failure mode this path exists to prevent
              if (n == 0)
                MediaFeatures(m.media_id, m.kind, decoded = false,
                  0, 0, 0, 0, 0, 0, 0, 0, 0)
              else
                MediaFeatures(m.media_id, m.kind, decoded = true,
                  frames(0).width, frames(0).height,
                  b / n, g / n, r / n, 0, 0, 0, 0, frames.length)
            }
          case _ =>
            MediaFeatures(m.media_id, m.kind, decoded = false,
              0, 0, 0, 0, 0, 0, 0, 0, 0)
        }
      }
    }
  }

  /** Synthesize REAL video payloads: multi-frame animated GIFs (frame
    * pixels a pure function of (media_id, frame)), every fourth row a
    * truncated/corrupt payload that must route, not throw.
    */
  def synthesizeRealVideo(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      if (i % 4 == 3)
        MediaRow(i, "video", Array[Byte]('G', 'I', 'F', '8', '9'))
      else {
        val w = 8 + (i % 16).toInt
        val h = 8 + (i % 8).toInt
        val nf = 2 + (i % 4).toInt
        val frames = (0 until nf).map { f =>
          val px = new Array[Byte](w * h * 3)
          var j = 0
          while (j < px.length) {
            px(j) = graft.pipeline.Fixtures.mix(i * 31L + f * 7L + j).toByte
            j += 1
          }
          MediaCodecs.Bmp(w, h, px)
        }
        MediaRow(i, "video", MediaCodecs.encodeGifAnimated(frames))
      }
    }
  }

  /** REAL frame sampling: decode animated-GIF videos and emit every
    * `stride`-th frame re-encoded as BMP bytes (`offset` = -1: frames are
    * decoded, not byte-sliced). Undecodable payloads yield no frames —
    * they surface through decodeFeatures' decoded=false routing instead.
    */
  def sampleVideoFrames(media: Dataset[MediaRow],
      stride: Int): Dataset[Frame] = {
    require(stride > 0, s"stride must be positive: $stride")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = MediaCodecs.decodeGifFrames(m.payload)
      if (frames == null) Seq.empty
      else (0 until frames.length by stride).map { f =>
        Frame(m.media_id, f, -1, MediaCodecs.encodeBmp(frames(f)))
      }
    }
  }

  /** REAL resize: decode BMP payloads, nearest-neighbor resize to (w, h),
    * re-encode — the "normalize to model input size" stage. Non-images and
    * undecodable payloads pass through unchanged.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int)
      : Dataset[MediaRow] = {
    // fail fast on the driver (the module's sampleFrames convention): a
    // negative dimension would otherwise surface as a per-task
    // NegativeArraySizeException inside resizeBmp, and 0 would silently
    // emit degenerate zero-pixel "images"
    require(w > 0 && h > 0, s"target dimensions must be positive: ${w}x$h")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        if (m.kind != "image") m
        else {
          val img = MediaCodecs.decodeAnyImage(m.payload)
          if (img == null) m
          else MediaRow(m.media_id, m.kind,
            MediaCodecs.encodeBmp(MediaCodecs.resizeBmp(img, w, h)))
        }
      }
    }
  }

  /** DataFrame view with metadata attached — the shape a downstream
    * training-data pipeline consumes (binary + struct metadata columns).
    * ONE pass: payload and parsed header travel in the same row (the old
    * self-join against decodeMeta evaluated the media source — synthesis
    * or decode — twice; round-5 review find).
    */
  def withMeta(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val mm = metaOf(m)
      (m.media_id, m.kind, m.payload,
        (mm.byte_len, mm.width, mm.height, mm.n_frames))
    }).toDF("media_id", "kind", "payload", "meta")
      .withColumn("meta", col("meta").cast(
        "struct<byte_len:int,width:int,height:int,n_frames:int>"))
  }
}
