package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Flesch reading-ease score in exact integer milli-points, fused into
  * ONE byte scan — the native form of q254's declared four-regexp
  * pipeline (collapse non-space runs / strip / collapse vowel groups /
  * strip), which was the worst sub-linear sf10 ratio left (24× at
  * 100× data; the same fusion on q260 measured 13.9 s → 0.45 s).
  *
  * Declared semantics, replayed exactly:
  *   W   = max(1, count of maximal runs of non-space chars)   ([^ ]+)
  *   Syl = max(1, count of maximal [aeiouy]+ runs in lower(text))
  *   S   = 1 + (W-1) div 20          (20-word pseudo-sentences)
  *   fre_milli = 206835 - (1015·W) div S - (84600·Syl) div W
  *
  * The scan is BYTE-level and still exact on any UTF-8 input: the run
  * separators (space 0x20) and vowels are ASCII, and every byte of a
  * multi-byte code point has the high bit set — it can never equal an
  * ASCII byte, so it breaks/extends runs exactly as the per-character
  * regex does. Codegen emits a single static call, keeping the
  * surrounding stage whole-stage-compiled. */
case class FleschMilli(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fre_milli expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    FleschMilli.freMilli(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FleschMilli.freMilli($c)")

  override protected def withNewChildInternal(newChild: Expression): FleschMilli =
    copy(child = newChild)
}

object FleschMilli {

  private def isVowel(b: Byte): Boolean = (b: @annotation.switch) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' |
         'A' | 'E' | 'I' | 'O' | 'U' | 'Y' => true
    case _ => false
  }

  /** One pass over the UTF-8 bytes: W and Syl counted together. Called
    * from generated code — public, static-shaped, allocation-free. */
  def freMilli(s: UTF8String): Long = {
    val bytes = s.getBytes
    var w = 0L
    var syl = 0L
    var inWord = false
    var inVowel = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val word = b != ' '.toByte
      if (word && !inWord) w += 1
      inWord = word
      val vowel = isVowel(b)
      if (vowel && !inVowel) syl += 1
      inVowel = vowel
      i += 1
    }
    if (w < 1) w = 1
    if (syl < 1) syl = 1
    val sent = 1L + (w - 1) / 20
    206835L - (1015L * w) / sent - (84600L * syl) / w
  }

  /** Register `graft_fre_milli(text)` in the session registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fre_milli", exprs => FleschMilli(exprs.head), "scala_udf")

  def milli(text: Column): Column = call_function("graft_fre_milli", text)
}
