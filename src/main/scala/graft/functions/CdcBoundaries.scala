package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary count — the fused native form of
  * q260's declared HOF pipeline: a boundary lands after position i
  * (1-based, i ≥ 8) when the polynomial hash of the trailing 8-char
  * window, Σ code(c_j)·31^(7-j) mod 2^31, is ≡ 0 (mod 64). Semantics
  * are EXACTLY the HOF formulation over `ascii()` codes (= the
  * Unicode code point of the char, which for the ASCII corpus is the
  * byte); the implementation rolls the window incrementally —
  * H ← (H − c_out·31⁷)·31 + c_in — one multiply-add per char instead
  * of 8, with the unreduced window hash kept exact in a long
  * (≤ 0x10FFFF·Σ31^k < 2^53) and reduced mod 2^31 only at the test,
  * identical to reducing the full sum. Codegen emits a single static
  * call so the surrounding stage stays whole-stage-compiled. */
case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_bounds expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.countBoundaries(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcBoundaries.countBoundaries($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  private val W = 8
  private val Mod = 2147483648L // 2^31
  private val TopPow = 27512614111L // 31^7

  /** Exact rolling replay of the declared window hash. Called from
    * generated code — must stay public, static-shaped, and fast. */
  def countBoundaries(s: UTF8String): Int = {
    val n = s.numChars()
    if (n < W) return 0
    // ASCII fast path: byte offsets == char offsets. Non-ASCII decodes
    // the code points ONCE into a flat array (O(n)); the previous
    // offsetByCodePoints(0, i)-per-char form was O(n²) on multi-byte
    // input, and graft_cdc_bounds is session-registered so arbitrary
    // input reaches it.
    val ascii = s.numBytes() == n
    val bytes = if (ascii) s.getBytes else null
    val cps: Array[Int] =
      if (ascii) null
      else {
        val str = s.toString
        val out = new Array[Int](str.codePointCount(0, str.length))
        var ci = 0; var k = 0
        while (ci < str.length) {
          val cp = str.codePointAt(ci)
          out(k) = cp; k += 1; ci += Character.charCount(cp)
        }
        out
      }
    def code(i: Int): Long =
      if (ascii) (bytes(i) & 0x7f).toLong else cps(i).toLong
    var h = 0L
    var i = 0
    while (i < W) { h = h * 31 + code(i); i += 1 }
    var cnt = if (h % Mod % 64 == 0) 1 else 0
    while (i < n) {
      h = (h - code(i - W) * TopPow) * 31 + code(i)
      if (h % Mod % 64 == 0) cnt += 1
      i += 1
    }
    cnt
  }

  /** Register `graft_cdc_bounds(text)` in the session registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cdc_bounds", exprs => CdcBoundaries(exprs.head), "scala_udf")

  def bounds(text: Column): Column = call_function("graft_cdc_bounds", text)
}
