package graft

import org.apache.spark.sql.functions._

import graft.functions.NearestCell
import graft.operators.IvfIndex

/** The Catalyst-native IVF coarse quantizer (round-11 verdict #3):
  * NearestCell must assign bit-identically to the round-10 RDD kernel
  * it replaced, stay inside whole-stage codegen (the kernel's one
  * weakness), and plan instantly at the corpus-scaled k that killed
  * the k-wide literal form. */
class NearestCellSpec extends SparkTestBase {

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  test("expression assignments are bit-identical to the RDD kernel at scaled k") {
    val n = vecs.count()
    val k = IvfIndex.scaledK(n)
    val cs = IvfIndex.centroids(vecs, "id", "v", k)
      .map(_.toIndexedSeq).toIndexedSeq
    val viaExpr = IvfIndex.assignCells(vecs, "v", cs)
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val viaKernel = IvfIndex.assignCellsKernel(vecs, "v", cs)
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(viaExpr.size == n)
    assert(viaExpr == viaKernel)
  }

  test("assignment runs inside whole-stage codegen with no RDD round-trip") {
    val cs = IndexedSeq.tabulate(16, 64)((c, i) => (c * 64 + i).toDouble / 7.0)
      .map(_.toIndexedSeq)
    val assigned = IvfIndex.assignCells(vecs, "v", cs)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan.take(2000))
    // the `*(n)` operator prefix IS the whole-stage-codegen marker in
    // executedPlan.toString; the assignment projection must carry it
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_nearest_cell") && l.contains("*(")), plan.take(2000))
    // and the matrix prints as its shape, never inline (plan-string
    // hygiene: 28k doubles at the sf10 corpus)
    assert(plan.contains("matrix>"), plan.take(2000))
  }

  test("one node at any k: the k=447 planning degeneration cannot recur") {
    // the k-wide literal form (~k·dim nodes) never finished PLANNING at
    // k=447; a single matrix-state node must plan + run in seconds
    val k = 447
    val dim = 64
    val cs = IndexedSeq.tabulate(k, dim)((c, i) =>
      ((c * 1103515245L + i * 12345L) % 1000L).toDouble).map(_.toIndexedSeq)
    val t0 = System.nanoTime()
    val out = IvfIndex.assignCells(vecs, "v", cs).agg(
      countDistinct("cell").as("cells"), count(lit(1)).as("n")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.getLong(1) == vecs.count())
    assert(sec < 60.0, s"assignment at k=$k took ${sec}s — planning degeneration?")
  }

  test("ties break to the lowest cell; SQL surface refuses non-literal matrices") {
    NearestCell.register(spark)
    // two identical centroids: strict < keeps the first
    val tie = spark.sql(
      "SELECT graft_nearest_cell(array(1.0d, 2.0d), " +
        "array(array(0.0d, 0.0d), array(0.0d, 0.0d))) AS c").head().getInt(0)
    assert(tie == 0)
    // equidistant distinct centroids (symmetric about the probe)
    val mid = spark.sql(
      "SELECT graft_nearest_cell(array(1.0d), array(array(0.0d), array(2.0d))) AS c")
      .head().getInt(0)
    assert(mid == 0)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_nearest_cell(array(1.0d), array(array(rand()))) AS c")
        .head()
    }
    // the matrixOf foldable contract, pinned (round-11 verdict): a
    // non-literal quantizer refuses with ITS OWN message — index
    // metadata never rides in as row data
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("centroid matrix must be a literal"))),
      e.toString)
  }

  test("a vector shorter than the centroid dim fails with the contract, not ArrayIndexOutOfBounds") {
    // round-11 advisor finding: nearest() indexed v.getDouble(i) for
    // i < dim unguarded — a short vector threw AIOOBE from GENERATED
    // code. Unreachable on declared paths (staged indexes are
    // fixed-dim) but the SQL surface is public.
    NearestCell.register(spark)
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_nearest_cell(array(1.0d), " +
        "array(array(0.0d, 0.0d), array(3.0d, 4.0d))) AS c").head()
    }
    val hit = causes(e).collectFirst {
      case c: IllegalArgumentException if
        Option(c.getMessage).exists(_.contains("1 elements")) => c
    }
    assert(hit.isDefined, e.toString)
    assert(hit.get.getMessage.contains("2-dimensional"))
    assert(!causes(e).exists(_.isInstanceOf[ArrayIndexOutOfBoundsException]))
    // extra TRAILING elements are ignored — the kernel's semantics
    val long = spark.sql("SELECT graft_nearest_cell(array(3.0d, 4.0d, 99.0d), " +
      "array(array(0.0d, 0.0d), array(3.0d, 4.0d))) AS c").head().getInt(0)
    assert(long == 1)
  }
}
