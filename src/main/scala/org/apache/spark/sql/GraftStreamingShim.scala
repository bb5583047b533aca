package org.apache.spark.sql

/** The one `private[sql]` hop a DSv1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * cannot avoid: `MicroBatchExecution` rejects a `getBatch` result
  * whose plan is not flagged `isStreaming`, and the only way to set
  * the flag is `SparkSession.internalCreateDataFrame` — exactly how
  * Spark's own `FileStreamSource` marks its batches. Nothing else
  * lives in this package. */
object GraftStreamingShim {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
}
