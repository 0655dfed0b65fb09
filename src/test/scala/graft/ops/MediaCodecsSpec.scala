package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM BMP/WAV codec correctness + the real multimodal decode path. */
class MediaCodecsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("BMP round-trip: encode -> decode is identity") {
    val w = 5; val h = 3 // width 5 forces row padding (15 bytes -> 16)
    val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 37 + 11) & 0xff).toByte)
    val img = MediaCodecs.Bmp(w, h, px)
    val decoded = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img))
    assert(decoded != null)
    assert(decoded.width == w && decoded.height == h)
    assert(decoded.pixels.toSeq == px.toSeq)
  }

  test("BMP decode rejects garbage and truncation") {
    assert(MediaCodecs.decodeBmp(Array[Byte](1, 2, 3)) == null)
    assert(MediaCodecs.decodeBmp(Array.fill[Byte](54)(0)) == null)
    val good = MediaCodecs.encodeBmp(
      MediaCodecs.Bmp(4, 4, new Array[Byte](48)))
    assert(MediaCodecs.decodeBmp(good.dropRight(10)) == null)
  }

  test("BMP resize: nearest-neighbor, known values") {
    // 2x2 image, distinct pixels; upscale to 4x4 duplicates each quadrant
    val px = Array[Byte](
      10, 11, 12, 20, 21, 22,
      30, 31, 32, 40, 41, 42)
    val up = MediaCodecs.resizeBmp(MediaCodecs.Bmp(2, 2, px), 4, 4)
    assert(up.width == 4 && up.height == 4)
    // top-left quadrant = pixel (0,0)
    assert(up.pixels.slice(0, 3).toSeq == Seq[Byte](10, 11, 12))
    assert(up.pixels.slice(3, 6).toSeq == Seq[Byte](10, 11, 12))
    // top-right quadrant = pixel (0,1)
    assert(up.pixels.slice(6, 9).toSeq == Seq[Byte](20, 21, 22))
    // bottom-right = pixel (1,1)
    assert(up.pixels.slice(45, 48).toSeq == Seq[Byte](40, 41, 42))
  }

  test("BMP mean channel features") {
    val px = Array[Byte](0, 100, -56, 10, 110, -46) // B:0,10 G:100,110 R:200,210
    val (b, g, r) = MediaCodecs.bmpMeanBgrMilli(MediaCodecs.Bmp(2, 1, px))
    assert(b == 5000L && g == 105000L && r == 205000L)
  }

  test("WAV round-trip incl. chunk-walk and RMS") {
    val samples = Array[Short](0, 1000, -1000, 500, -500, 32767, -32768, 0)
    val wav = MediaCodecs.Wav(2, 44100, samples)
    val dec = MediaCodecs.decodeWav(MediaCodecs.encodeWav(wav))
    assert(dec != null)
    assert(dec.channels == 2 && dec.sampleRate == 44100)
    assert(dec.samples.toSeq == samples.toSeq)
    // RMS of constant 1000 = 1000 -> milli 1000000
    assert(MediaCodecs.wavRmsMilli(
      MediaCodecs.Wav(1, 8000, Array[Short](1000, 1000, -1000))) == 1000000L)
    assert(MediaCodecs.decodeWav("RIFFjunk".getBytes) == null)
  }

  test("WAV channel-0 sampling with stride") {
    // stereo: ch0 = 1,3,5,7  ch1 = 2,4,6,8
    val w = MediaCodecs.Wav(2, 8000, Array[Short](1, 2, 3, 4, 5, 6, 7, 8))
    assert(MediaCodecs.sampleAudio(w, 1).toSeq == Seq[Short](1, 3, 5, 7))
    assert(MediaCodecs.sampleAudio(w, 2).toSeq == Seq[Short](1, 5))
    assert(MediaCodecs.sampleAudio(w, 3).toSeq == Seq[Short](1, 7))
  }

  test("PNG round-trip via ImageIO is lossless, pixel-exact") {
    val w = 9; val h = 7
    val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 53 + 7) & 0xff).toByte)
    val img = MediaCodecs.Bmp(w, h, px)
    val png = MediaCodecs.encodeJvmImage(img, "png")
    // PNG magic, not a BMP — exercises the ImageIO path through the sniffer
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P')
    assert(MediaCodecs.decodeBmp(png) == null)
    val dec = MediaCodecs.decodeAnyImage(png)
    assert(dec != null && dec.width == w && dec.height == h)
    assert(dec.pixels.toSeq == px.toSeq)
  }

  test("JPEG decode via ImageIO: exact dimensions, means within lossy " +
    "tolerance") {
    val w = 32; val h = 24
    // smooth gradient (JPEG-friendly): mean error stays small
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      px(d) = (x * 4).toByte; px(d + 1) = (y * 5).toByte
      px(d + 2) = ((x + y) * 2).toByte
    }
    val img = MediaCodecs.Bmp(w, h, px)
    val jpg = MediaCodecs.encodeJvmImage(img, "jpg")
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // JFIF magic
    val dec = MediaCodecs.decodeAnyImage(jpg)
    assert(dec != null && dec.width == w && dec.height == h)
    val (b0, g0, r0) = MediaCodecs.bmpMeanBgrMilli(img)
    val (b1, g1, r1) = MediaCodecs.bmpMeanBgrMilli(dec)
    // means in milli-units; allow 4/255 channel drift for the lossy codec
    assert(math.abs(b1 - b0) < 4000 && math.abs(g1 - g0) < 4000 &&
      math.abs(r1 - r0) < 4000, s"($b0,$g0,$r0) vs ($b1,$g1,$r1)")
    // corrupt JPEG still routes as null, never throws
    assert(MediaCodecs.decodeJvmImage(jpg.take(20)) == null)
  }

  test("real multimodal pipeline: decode, route corrupt, resize") {
    import spark.implicits._
    val media = Multimodal.synthesizeReal(spark, 30)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 30)
    val images = feats.filter(f => f.media_id % 3 == 0)
    val audio = feats.filter(f => f.media_id % 3 == 1)
    val corrupt = feats.filter(f => f.media_id % 3 == 2)
    assert(images.forall(f => f.decoded && f.width >= 8 && f.height >= 8))
    assert(audio.forall(f => f.decoded && f.sample_rate == 16000 &&
      f.n_samples >= 64 && f.rms_milli > 0))
    assert(corrupt.forall(!_.decoded)) // routed, not thrown
    // resize every decodable image to 16x16 and re-decode
    val resized = Multimodal.resizeImages(media, 16, 16)
    val rf = Multimodal.decodeFeatures(resized).collect()
    // row-preserving (round-5 test-review find: the pass-through foralls
    // below are vacuous if resize drops non-image or corrupt rows)
    assert(rf.length == 30)
    assert(rf.filter(f => f.media_id % 3 == 0)
      .forall(f => f.decoded && f.width == 16 && f.height == 16))
    assert(rf.filter(f => f.media_id % 3 == 2).forall(!_.decoded))
  }

  test("animated GIF: multi-frame encode/decode round-trip, frame count " +
    "and per-frame pixel fidelity (palette-quantized)") {
    val frames = (0 until 3).map { f =>
      val w = 10; val h = 6
      val px = new Array[Byte](w * h * 3)
      // flat per-frame color — survives GIF's 256-color palette exactly
      java.util.Arrays.fill(px, (40 * (f + 1)).toByte)
      MediaCodecs.Bmp(w, h, px)
    }
    val gif = MediaCodecs.encodeGifAnimated(frames)
    val dec = MediaCodecs.decodeGifFrames(gif)
    assert(dec != null && dec.length == 3)
    dec.zipWithIndex.foreach { case (d, f) =>
      assert(d.width == 10 && d.height == 6)
      assert(d.pixels.forall(_ == (40 * (f + 1)).toByte),
        s"frame $f pixels changed")
    }
    // truncated GIF routes as null, never throws
    assert(MediaCodecs.decodeGifFrames(gif.take(12)) == null)
    assert(MediaCodecs.decodeGifFrames(Array[Byte]('G', 'I', 'F')) == null)
  }

  test("video pipeline: GIF frames -> features, strided sampling, " +
    "corrupt payloads routed") {
    val media = Multimodal.synthesizeRealVideo(spark, 20)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 20)
    val ok = feats.filter(f => f.media_id % 4 != 3)
    val corrupt = feats.filter(f => f.media_id % 4 == 3)
    assert(ok.forall(f => f.decoded && f.kind == "video" &&
      f.n_frames == 2 + (f.media_id % 4).toInt && f.width >= 8))
    assert(corrupt.forall(!_.decoded)) // truncated GIF header: routed
    // strided sampling: every 2nd frame, re-encoded as decodable BMPs
    val sampled = Multimodal.sampleVideoFrames(media, stride = 2).collect()
    val byId = sampled.groupBy(_.media_id)
    assert(!byId.contains(3L) && !byId.contains(7L)) // corrupt -> no frames
    assert(byId(0L).map(_.frame_idx).sorted.sameElements(Array(0)))
    assert(byId(2L).map(_.frame_idx).sorted.sameElements(Array(0, 2)))
    assert(sampled.forall(f =>
      MediaCodecs.decodeBmp(f.frame_bytes) != null))
  }

  test("video features: a GIF decoding to zero total pixels routes as " +
    "undecoded instead of dividing by zero in the task") {
    import spark.implicits._
    // hand-built GIF89a with a 0x0 logical screen and a 0x0 image
    // descriptor — whether ImageIO throws (decodeGifFrames -> null) or
    // yields empty frames, decodeFeatures must emit decoded=false, never
    // throw (the route-never-die contract)
    val zeroGif: Array[Byte] = Array[Byte](
      'G', 'I', 'F', '8', '9', 'a',
      0, 0, 0, 0, // logical screen 0x0
      0x70.toByte, 0, 0, // no GCT, bg, aspect
      0x2c, 0, 0, 0, 0, 0, 0, 0, 0, // image descriptor at (0,0) size 0x0
      0x00, // no LCT, no flags
      0x02, // LZW min code size
      0x01, 0x00, // one data sub-block
      0x00, // block terminator
      0x3b // trailer
    )
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, "video", zeroGif)))
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 1 && !feats(0).decoded)
  }
}
