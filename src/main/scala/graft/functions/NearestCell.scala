package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid cell assignment (the IVF coarse quantizer) as ONE
  * Catalyst expression node holding the whole k×dim centroid matrix as
  * expression state — the CdcBoundaries shape.
  *
  * This replaces the round-10 RDD `mapPartitions` kernel in
  * [[graft.operators.IvfIndex.assignCells]]: the kernel existed because
  * the k-wide literal form (`array(dist2(c0), …, dist2(ck))`, ~k·dim
  * expression nodes) degenerated at plan time once k scaled with the
  * corpus (k=447 never finished planning), but the kernel itself exits
  * whole-stage codegen and row-converts its input. A single node with
  * the matrix as state plans at ANY k, stays inside whole-stage codegen
  * (one static call, like [[CdcBoundaries]]), and reads the vector
  * straight from columnar/unsafe ArrayData — no Row round-trip.
  *
  * Semantics are EXACTLY the kernel's (bit-reproducible, required by
  * the q67/q227/q304 cross-engine oracle replays): per-dimension
  * squared-distance accumulation strictly left-to-right
  * (`d += (v_i − c_i)²`), argmin with strict `<` so ties break to the
  * LOWEST cell — DuckDB's `list_position(ds, list_min(ds))`
  * first-occurrence rule. */
case class NearestCell(child: Expression, cents: Seq[Seq[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if cents.nonEmpty &&
        cents.forall(_.length == cents.head.length) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      "graft_nearest_cell: centroid matrix must be non-empty and rectangular")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  // flattened row-major copy for the hot loop; the Seq[Seq[Double]]
  // constructor field keeps structural equality for plan canonicalization
  @transient private lazy val flat: Array[Double] = cents.flatten.toArray
  private val dim: Int = if (cents.isEmpty) 0 else cents.head.length

  override def nullSafeEval(input: Any): Any =
    NearestCell.nearest(input.asInstanceOf[ArrayData], flat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCentroids", flat, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NearestCell.nearest($c, $ref, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)

  // the default TreeNode rendering would embed the whole k×dim matrix
  // (28k doubles at the sf10 corpus) into every plan string / explain /
  // log line — print its shape instead
  override def toString: String =
    s"graft_nearest_cell($child, <${cents.length}x$dim matrix>)"
  override def sql: String =
    s"graft_nearest_cell(${child.sql}, <${cents.length}x$dim matrix>)"
}

object NearestCell {

  /** Argmin cell for one vector. Called from generated code — public,
    * static-shaped. Accumulation order and tie-break are the contract
    * (see class doc); do not reorder the loops. */
  def nearest(v: ArrayData, flat: Array[Double], dim: Int): Int = {
    // a shorter vector would throw ArrayIndexOutOfBounds from GENERATED
    // code (round-11 advisor finding) — fail with the actual contract
    // instead; extra trailing elements are ignored, matching the kernel
    if (v.numElements() < dim) throw new IllegalArgumentException(
      s"graft_nearest_cell: vector has ${v.numElements()} elements but " +
        s"the centroid matrix is $dim-dimensional")
    val k = if (dim == 0) 0 else flat.length / dim
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var d = 0.0
      var i = 0
      while (i < dim) {
        val t = v.getDouble(i) - flat(off + i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c } // strict <: first min wins
      c += 1
    }
    best
  }

  /** The SQL surface takes the matrix as a (foldable) nested-array
    * literal — ONE node — and bakes it into the expression at
    * resolution time. Non-literal matrices are refused: the quantizer
    * is index metadata, never row data. */
  private def matrixOf(e: Expression): Seq[Seq[Double]] = {
    require(e.foldable, "graft_nearest_cell: centroid matrix must be a literal")
    e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) =>
      case other => throw new IllegalArgumentException(
        s"graft_nearest_cell: matrix must be array<array<double>>, got ${other.simpleString}")
    }
    val ad = e.eval(InternalRow.empty).asInstanceOf[ArrayData]
    (0 until ad.numElements()).map(i => ad.getArray(i).toDoubleArray().toSeq)
  }

  /** Register `graft_nearest_cell(vec, matrix_literal)` in the session
    * registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_cell",
      exprs => NearestCell(exprs.head, matrixOf(exprs(1))), "scala_udf")

  /** Column-API entry point (call [[register]] on the session first). */
  def cell(v: Column, cents: Seq[Seq[Double]]): Column =
    call_function("graft_nearest_cell", v, typedlit(cents))
}
