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
}
