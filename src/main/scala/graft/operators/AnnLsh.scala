package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over embedding columns via
  * multi-table random-hyperplane LSH: L independent tables, each an
  * H-bit signature (sign of the projection onto H fixed pseudo-random
  * hyperplanes). A pair is a candidate if it collides in ANY table —
  * short signatures keep buckets populated, multiple tables recover
  * recall.
  *
  * Scale path vs. brute force: brute force is one full scan per probe
  * (fine for few probes — see q40); bucketed search shuffles once on
  * the (table, key) pair, after which candidates are bucket-local, so
  * a batch of probes costs Σ|bucket| comparisons instead of |corpus|.
  * Hyperplanes are deterministic md5-derived constants, materialized
  * driver-side as literal arrays — row expressions only do the dot
  * product (executors never hash, no RNG state anywhere).
  */
object AnnLsh {

  val Tables = 4 // L
  val BitsPerTable = 6 // H
  val Dim = 64 // embedding dimensionality of the corpus

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    * first 4 md5 hex digits of "plane_dim", mod 1000, scaled. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"${plane}_$dim".getBytes(StandardCharsets.UTF_8))
    val hex4 = d.take(2).map(b => f"$b%02x").mkString // = first 4 hex chars
    (java.lang.Long.parseLong(hex4, 16) % 1000).toDouble / 1000.0 - 0.5
  }

  /** Literal hyperplane vectors, one per (table × bit). */
  private val planes: IndexedSeq[Column] =
    (0 until Tables * BitsPerTable).map(p =>
      array((0 until Dim).map(dm => lit(planeComponent(p, dm))): _*))

  private def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, z) => acc + z)

  /** One bucket key per table: "t:bitstring". */
  def bucketKeys(v: Column): Column =
    array((0 until Tables).map { t =>
      concat(lit(s"$t:"),
        concat((0 until BitsPerTable).map { j =>
          when(dot(v, planes(t * BitsPerTable + j)) >= 0, "1").otherwise("0")
        }: _*))
    }: _*)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  private def keyed(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(
      col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .select(col("id"), col("v"), explode(bucketKeys(col("v"))).as("bucket"))

  /** All pairs colliding in ≥1 table, with exact cosine — the
    * LSH-bucketed near-duplicate sweep.
    *
    * The cosine is computed BEFORE the multi-table dedup, so the
    * distinct shuffles (long, long, double) rows — never two dim-length
    * vectors per candidate (the recompute is one fused dot per
    * collision, ≤ Tables per pair; the array-carrying shuffle was the
    * q55-class scale defect). */
  def bucketedPairs(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val k = keyed(emb, idCol, vecCol)
    val a = k.select(col("bucket"), col("id").as("a_id"), col("v").as("va"))
    // shuffled hash, not broadcast: a corpus-scale bucket table must
    // never broadcast, and identical exchanges let ReusedExchange
    // compute the projection pipeline once for both sides
    val b = k.select(col("bucket"), col("id").as("b_id"), col("v").as("vb"))
      .hint("shuffle_hash")
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("va"), col("vb")).as("sim"))
      .distinct() // collapse multi-table collisions
  }

  /** Top-k neighbors for a BATCH of probe ids in one corpus pass:
    * probes broadcast with their buckets, candidates are bucket-local,
    * per-probe top-k via WindowGroupLimit. Cost is Σ|probe buckets|
    * comparisons — independent of corpus size per probe, the serving
    * shape for recall evaluation and bulk kNN labeling. */
  def batchTopK(emb: DataFrame, idCol: String, vecCol: String,
                probeIds: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kd = keyed(emb, idCol, vecCol)
    val probes = broadcast(kd.filter(col("id").isInCollection(probeIds))
      .select(col("id").as("probe_id"), col("bucket"), col("v").as("pv")))
    kd.join(probes, Seq("bucket"))
      .filter(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id"), cosine(col("v"), col("pv")).as("sim"))
      .distinct() // collapse multi-table collisions (sim is pair-pure)
      .withColumn("rn", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("sim").desc, col("id"))))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Top-k neighbors of one probe id, searching only its buckets. */
  def probeTopK(emb: DataFrame, idCol: String, vecCol: String,
                probeId: Long, k: Int): DataFrame = {
    val kd = keyed(emb, idCol, vecCol)
    val probe = broadcast(kd.filter(col("id") === probeId)
      .select(col("bucket"), col("v").as("pv")))
    kd.join(probe, Seq("bucket"))
      .filter(col("id") =!= probeId)
      .select(col("id"), cosine(col("v"), col("pv")).as("sim"))
      .distinct() // sim is a pure function of the pair → same cardinality
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }
}
