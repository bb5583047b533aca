package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator (UDTF surface, SURVEY.md Q53): splits a
  * string column into one row per token. Semantics match
  * `explode(split(col, delimiter))` exactly — including keeping
  * trailing empty tokens (Spark's `split` uses limit -1).
  *
  * A Generator runs inside GenerateExec on the executors — rows fan out
  * per-partition with no shuffle, so this is scale-transparent.
  */
case class TokenizeGenerator(child: Expression, delimiter: String = " ")
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    new StructType().add("token", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else v.asInstanceOf[UTF8String].toString
      .split(delimiter, -1).iterator
      .map(t => InternalRow(UTF8String.fromString(t)))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeGenerator =
    copy(child = newChild)
}

object TokenizeGenerator {
  /** Register `graft_tokenize(text)` in the session's function registry
    * so it is usable from SQL / `expr(...)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokenize", exprs => TokenizeGenerator(exprs.head), "scala_udf")
}
