package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with feature extraction running distributed per-partition.
  * All three modalities decode with REAL codecs the JDK ships: PNG via
  * javax.imageio, WAV/PCM via javax.sound.sampled, and motion-PNG
  * clips (the MJPEG container shape) via container parsing + the
  * per-frame image codec.
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

  /** Codec-free binary featurization: striped byte-sum moments, a
    * cheap content signature for payloads of ANY mime type (the
    * modality-specific decoders below extract richer features when the
    * type is known). Exact integer sums per stripe, single double
    * division, one float rounding — reproducible bit-for-bit by any
    * engine. */
  val byteMoments: Array[Byte] => Array[Float] = { bytes =>
    val out = new Array[Float](FeatureDim)
    if (bytes != null && bytes.nonEmpty) {
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

  private val decodeUdf = udf(byteMoments)

  /** Wrap a text table as a multimodal table (UTF-8 payloads) — the
    * fixture path until binary fixtures exist. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      struct(lit(0).as("width"), lit(0).as("height"),
        length(col(textCol)).cast("long").as("duration_ms")).as("meta"))

  /** Stride-k stream downsample as pure column ops (distributed,
    * codegen-friendly; no UDF): the subsample+digest shape over a
    * payload's character view. The codec-true image resize is
    * [[decodePng]]'s nearest-neighbor resample; this is the generic
    * payload-agnostic variant. */
  def resizeStride(payload: Column, k: Int): Column = {
    val chars = filter(split(payload.cast("string"), ""), c => c =!= "")
    array_join(filter(chars, (_, i) => i % k === 0), "")
  }

  /** Fixed-length frame sampling as pure column ops: cut the payload
    * into frameLen-sized frames, keep every `every`-th. The codec-true
    * variant (container parsing + per-frame decode) is [[decodeClip]];
    * this one covers fixed-stride formats (raw PCM, uncompressed
    * frames) without leaving whole-stage codegen. */
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
  // javax.sound.sampled for WAV), so no external libraries. Media is
  // GENERATED deterministically from a seed, and every decoded fact is
  // integer arithmetic of that seed — PNG and WAV are lossless, so
  // decode(encode(x)) == x and a SQL oracle can replay the decoded
  // values without any codec. Video uses the same contract: a clip is
  // an MJPEG-SHAPED container (whole still frames back-to-back) with
  // PNG frames instead of JPEGs — JPEG's lossy DCT would break the
  // cross-engine oracle replay, while the container parsing, frame
  // sampling, and per-frame decode are identical work.
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

  /** [[makePng]] with a brightness offset — pixel(x,y) = (x*7 + y*13 +
    * seed + off) % 256, dims still from the seed — for constructing
    * near-duplicate variants of a base image (small +off shifts every
    * pixel equally except where the %256 wrap flips a cell, so a
    * brightness-invariant perceptual hash lands a few bits away). */
  val makePng2: (Long, Long) => Array[Byte] = { (seed, off) =>
    val w = 8 + (seed % 9).toInt
    val h = 8 + (seed % 7).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7 + y * 13 + seed + off) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Average-hash (aHash) of a decoded image: 8×8 nearest-neighbor
    * grid g(i,j) = px(i·w/8, j·h/8), bit = g ≥ mean — compared as
    * 64·g ≥ Σg so the mean never leaves integer arithmetic. Emitted
    * as a 64-char bitstring (row-major, j outer) rather than a packed
    * BIGINT: bit 63 would wrap a signed long, and the SQL oracle
    * replays string positions more simply than two's-complement. */
  val ahash: Array[Byte] => String = { bytes =>
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    val g = Array.tabulate(64) { k =>
      (img.getRGB((k % 8) * w / 8, (k / 8) * h / 8) & 0xff).toLong
    }
    val s = g.sum
    g.map(v => if (64 * v >= s) '1' else '0').mkString
  }

  /** [[makeWav]] with a sample offset — s(t) = (t·37 + seed·11 + off)
    * % 2001 − 1000 — the audio analog of [[makePng2]]'s variants. */
  val makeWav2: (Long, Long) => Array[Byte] = { (seed, off) =>
    val n = 64 + (seed % 64).toInt
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = (((t * 37 + seed * 11 + off) % 2001) - 1000).toShort
      pcm(2 * t) = (s & 0xff).toByte
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

  /** Energy-contour fingerprint of a decoded WAV (the Haitsma–Kalker
    * bit derivation reduced to its integer core): 16 frames with
    * index-arithmetic bounds [f·n/16, (f+1)·n/16), E(f) = Σ s², bit
    * f = E(f) ≥ E(f−1) → 15-char bitstring. Exact BIGINT throughout
    * (no FFT, no floats) so a SQL oracle replays it from the sample
    * formula while the engine proves the codec round-trip. */
  val audioFp: Array[Byte] => String = { bytes =>
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val data = ais.readAllBytes()
    val n = data.length / 2
    def sample(t: Int): Long =
      ((data(2 * t) & 0xff) | (data(2 * t + 1) << 8)).toShort.toLong
    val e = Array.tabulate(16) { f =>
      var acc = 0L
      var t = f * n / 16
      val end = (f + 1) * n / 16
      while (t < end) { acc += sample(t) * sample(t); t += 1 }
      acc
    }
    (1 until 16).map(f => if (e(f) >= e(f - 1)) '1' else '0').mkString
  }

  val makePngUdf = udf(makePng)
  val makePng2Udf = udf(makePng2)
  val ahashUdf = udf(ahash)
  val makeWav2Udf = udf(makeWav2)
  val audioFpUdf = udf(audioFp)
  val decodePngUdf = udf(decodePng)
  val makeWavUdf = udf(makeWav)
  val decodeWavUdf = udf(decodeWav)

  /** Deterministic motion-PNG clip: nFrames = 4 + seed % 4, frame f
    * encoded by makePng(seed + f), frames concatenated back-to-back
    * (the MJPEG container shape). */
  val makeClip: Long => Array[Byte] = { seed =>
    val n = (4 + seed % 4).toInt
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < n) { bos.write(makePng(seed + f)); f += 1 }
    bos.toByteArray
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Frame boundaries by PARSING the container — signature, then the
    * chunk walk (length + type + data + CRC) to each frame's IEND —
    * never a byte-pattern scan, which compressed frame bodies could
    * spoof. Malformed streams fail loudly with the offset. */
  def splitFrames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val out = IndexedSeq.newBuilder[Array[Byte]]
    var i = 0
    while (i < bytes.length) {
      val start = i
      require(i + 8 <= bytes.length && PngSig.indices.forall(k => bytes(i + k) == PngSig(k)),
        s"not a PNG frame at offset $i")
      i += 8
      var done = false
      while (!done) {
        require(i + 8 <= bytes.length, s"truncated chunk header at offset $i")
        val len = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
          ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
        val typ = new String(bytes, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        i += 12 + len
        require(i <= bytes.length, s"chunk $typ overruns the stream")
        if (typ == "IEND") done = true
      }
      out += java.util.Arrays.copyOfRange(bytes, start, i)
    }
    out.result()
  }

  /** Decoded clip facts: total frames, sampled (every-k-th) frames,
    * and exact integer sums of the SAMPLED frames' decoded pixels and
    * widths — keyframe sampling with real pixel access. */
  case class VideoFacts(n_frames: Int, n_sampled: Int, sum_v: Long, sum_w: Long)

  def decodeClip(every: Int): Array[Byte] => VideoFacts = { bytes =>
    val frames = splitFrames(bytes)
    var sv = 0L
    var sw = 0L
    var n = 0
    var f = 0
    while (f < frames.length) {
      if (f % every == 0) {
        val facts = decodePng(frames(f))
        sv += facts.sum_v; sw += facts.width; n += 1
      }
      f += 1
    }
    VideoFacts(frames.length, n, sv, sw)
  }

  val makeClipUdf = udf(makeClip)
  val decodeClipUdf = udf(decodeClip(every = 2))

  /** [[makeClip]] with a per-frame brightness offset — frame f encoded
    * by [[makePng2]](seed + f, off), nFrames still 4 + seed % 4 — for
    * constructing near-duplicate clip variants (the video analog of
    * makePng2/makeWav2's variants). */
  val makeClip2: (Long, Long) => Array[Byte] = { (seed, off) =>
    val n = (4 + seed % 4).toInt
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < n) { bos.write(makePng2(seed + f, off)); f += 1 }
    bos.toByteArray
  }

  /** Clip fingerprint: container chunk-walk ([[splitFrames]]), then
    * the [[ahash]] of every 2nd frame (q190's sampling protocol),
    * concatenated in frame order → a 64·n_sampled-char bitstring.
    * Real per-frame pixel decode through the JDK codec — the oracle
    * replays the arithmetic, the engine proves the round-trip. */
  val clipFp: Array[Byte] => String = { bytes =>
    splitFrames(bytes).zipWithIndex
      .collect { case (fb, i) if i % 2 == 0 => ahash(fb) }.mkString
  }

  val makeClip2Udf = udf(makeClip2)
  val clipFpUdf = udf(clipFp)
}
