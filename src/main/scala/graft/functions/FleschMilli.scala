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
  * The scan is BYTE-level on pure-ASCII input (separators and vowels
  * are ASCII, and multi-byte code points have the high bit set, so
  * they break/extend runs exactly as the per-character regex does).
  * Case-folding caveat (advisor r7): some non-ASCII code points
  * LOWERCASE to an ASCII vowel — U+0130 'İ' → 'i' — so a byte scan
  * would diverge from a `lower(text)`-first formulation there. The
  * scan therefore detects any high bit and falls back to a
  * per-code-point pass using Character.toLowerCase — SIMPLE,
  * locale-independent Unicode folding, the same 1:1 mapping DuckDB's
  * utf8proc lower() applies — which is the pinned semantics
  * (deliberately NOT Spark's lower(), whose String.toLowerCase is
  * default-locale-sensitive and 1:many for 'İ'). FleschMilliSpec
  * pins U+0130 explicitly. Codegen emits a single static call,
  * keeping the surrounding stage whole-stage-compiled. */
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
    * from generated code — public, static-shaped, allocation-free on
    * the (overwhelmingly common) pure-ASCII path; any high-bit byte
    * reroutes to the per-code-point fold (see class doc). */
  def freMilli(s: UTF8String): Long = {
    val bytes = s.getBytes
    var w = 0L
    var syl = 0L
    var inWord = false
    var inVowel = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b < 0) return freMilliCodepoints(s)
      val word = b != ' '.toByte
      if (word && !inWord) w += 1
      inWord = word
      val vowel = isVowel(b)
      if (vowel && !inVowel) syl += 1
      inVowel = vowel
      i += 1
    }
    score(w, syl)
  }

  /** Non-ASCII fallback: identical run-counting over CODE POINTS, with
    * simple (1:1, locale-independent) case folding per code point —
    * Character.toLowerCase, matching utf8proc's lower(), so e.g.
    * U+0130 'İ' folds to 'i' and joins a vowel run. */
  private def freMilliCodepoints(s: UTF8String): Long = {
    val str = s.toString
    var w = 0L
    var syl = 0L
    var inWord = false
    var inVowel = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      val word = cp != ' '.toInt
      if (word && !inWord) w += 1
      inWord = word
      val vowel = lc < 128 && isVowel(lc.toByte)
      if (vowel && !inVowel) syl += 1
      inVowel = vowel
      i += Character.charCount(cp)
    }
    score(w, syl)
  }

  private def score(w0: Long, syl0: Long): Long = {
    val w = if (w0 < 1) 1L else w0
    val syl = if (syl0 < 1) 1L else syl0
    val sent = 1L + (w - 1) / 20
    206835L - (1015L * w) / sent - (84600L * syl) / w
  }

  /** Register `graft_fre_milli(text)` in the session registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fre_milli", exprs => FleschMilli(exprs.head), "scala_udf")

  def milli(text: Column): Column = call_function("graft_fre_milli", text)
}
