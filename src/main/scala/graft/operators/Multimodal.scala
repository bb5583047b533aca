package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with feature extraction running distributed per-partition.
  *
  * The real decode step (image/audio codecs) is STUBBED — the
  * container ships no media libraries — behind [[decodeStub]], a
  * deterministic fake with the exact shape a codec UDF would have
  * (bytes → fixed-length float features). Everything around it —
  * schema, batching, partition-parallel execution, feature schema —
  * is real Spark plumbing: swap [[decodeStub]] for a JNI/codec call
  * and nothing else changes.
  */
object Multimodal {

  val FeatureDim = 4

  /** Canonical multimodal record schema: payload + typed metadata. */
  val mediaSchema: StructType = new StructType()
    .add("media_id", LongType)
    .add("payload", BinaryType)
    .add("mime", StringType)
    .add("meta", new StructType()
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("duration_ms", LongType))

  /** STUB decode: bytes → FeatureDim floats. Deterministic fake
    * (byte-sum moments over stripes) standing in for a codec; the
    * signature (Array[Byte] => Array[Float]) is the contract a real
    * decoder would fill. */
  val decodeStub: Array[Byte] => Array[Float] = { bytes =>
    val out = new Array[Float](FeatureDim)
    if (bytes != null && bytes.nonEmpty) {
      // exact integer sums per stripe, single double division, one
      // float rounding — reproducible bit-for-bit by any engine
      val sums = new Array[Long](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        sums(i % FeatureDim) += (bytes(i) & 0xff).toLong
        i += 1
      }
      var j = 0
      while (j < FeatureDim) { out(j) = (sums(j).toDouble / bytes.length).toFloat; j += 1 }
    }
    out
  }

  private val decodeUdf = udf(decodeStub)

  /** Wrap a text table as a multimodal table (UTF-8 payloads) — the
    * fixture path until binary fixtures exist. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      struct(lit(0).as("width"), lit(0).as("height"),
        length(col(textCol)).cast("long").as("duration_ms")).as("meta"))

  /** STUB resize: stride-k downsample of the payload byte stream —
    * the shape of a real image resize (subsample + digest), expressed
    * as pure column ops so it stays distributed and codegen-friendly.
    * Operates on the payload's character view (fixture payloads are
    * ASCII text; a codec build would swap in byte-level ops). */
  def resizeStride(payload: Column, k: Int): Column = {
    val chars = filter(split(payload.cast("string"), ""), c => c =!= "")
    array_join(filter(chars, (_, i) => i % k === 0), "")
  }

  /** STUB frame-sample: cut the payload into fixed-size frames and
    * keep every `every`-th one (a video keyframe-sampling shape). */
  def sampleFrames(payload: Column, frameLen: Int, every: Int): Column = {
    val s = payload.cast("string")
    val nFrames = ceil(length(s) / lit(frameLen.toDouble)).cast("int")
    val kept = filter(sequence(lit(0), nFrames - 1), f => f % every === 0)
    transform(kept, f => s.substr(f * frameLen + 1, lit(frameLen)))
  }

  /** Distributed feature extraction: one projection, decode runs
    * per-row on executors; no shuffle, scale-transparent. */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      length(col("payload")).cast("bigint").as("n_bytes"),
      md5(col("payload")).as("digest"),
      decodeUdf(col("payload")).as("features"))

  // ------------------------------------------------------------------
  // REAL codecs — the JDK ships them (javax.imageio for PNG,
  // javax.sound.sampled for WAV), so image and audio decode need no
  // external libraries. Media is GENERATED deterministically from a
  // seed, and every decoded fact is integer arithmetic of that seed —
  // PNG and WAV are lossless, so decode(encode(x)) == x and a SQL
  // oracle can replay the decoded values without any codec. Video
  // remains stubbed (no video codec in the JDK).
  // ------------------------------------------------------------------

  /** Deterministic grayscale PNG: w = 8+seed%9, h = 8+seed%7,
    * pixel(x,y) = (x*7 + y*13 + seed) % 256 in all three channels. */
  val makePng: Long => Array[Byte] = { seed =>
    val w = 8 + (seed % 9).toInt
    val h = 8 + (seed % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7 + y * 13 + seed) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded image facts, all exact integers: dimensions, pixel sum,
    * and a 4×4 nearest-neighbor resample's sample sum (the resize
    * kernel as index arithmetic — out(i,j) = in(i*w/4, j*h/4)). */
  case class ImageFacts(width: Int, height: Int, sum_v: Long, resample_sum: Long)

  val decodePng: Array[Byte] => ImageFacts = { bytes =>
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += (img.getRGB(x, y) & 0xff).toLong; x += 1 }
      y += 1
    }
    var rs = 0L
    var j = 0
    while (j < 4) {
      var i = 0
      while (i < 4) { rs += (img.getRGB(i * w / 4, j * h / 4) & 0xff).toLong; i += 1 }
      j += 1
    }
    ImageFacts(w, h, sum, rs)
  }

  /** Deterministic 16-bit mono PCM WAV at 8 kHz: n = 64+seed%64
    * samples, s(t) = (t*37 + seed*11) % 2001 − 1000. */
  val makeWav: Long => Array[Byte] = { seed =>
    val n = 64 + (seed % 64).toInt
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = (((t * 37 + seed * 11) % 2001) - 1000).toShort
      pcm(2 * t) = (s & 0xff).toByte // little-endian
      pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded audio facts: sample rate, frame count, Σ s² (exact
    * BIGINT energy — no sqrt, so no libm portability hazard), max |s|. */
  case class AudioFacts(sample_rate: Int, frames: Long, energy: Long, max_amp: Int)

  val decodeWav: Array[Byte] => AudioFacts = { bytes =>
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    val data = ais.readAllBytes()
    val n = data.length / 2
    var energy = 0L
    var maxAmp = 0
    var t = 0
    while (t < n) {
      // 16-bit little-endian signed
      val s = ((data(2 * t) & 0xff) | (data(2 * t + 1) << 8)).toShort.toInt
      energy += s.toLong * s
      if (math.abs(s) > maxAmp) maxAmp = math.abs(s)
      t += 1
    }
    AudioFacts(fmt.getSampleRate.toInt, n.toLong, energy, maxAmp)
  }

  val makePngUdf = udf(makePng)
  val decodePngUdf = udf(decodePng)
  val makeWavUdf = udf(makeWav)
  val decodeWavUdf = udf(decodeWav)
}
