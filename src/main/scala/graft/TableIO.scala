package graft

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Lakehouse table IO helpers.
  *
  * Bucketed layout is the co-located-join primitive at 100 TB: two
  * tables bucketed (and sorted) on the join key with the same bucket
  * count join with NO exchange on either side — the shuffle is paid
  * once at write time and amortized over every subsequent join.
  * (Catalog-backed, because bucket metadata lives in the table
  * definition; the session's in-memory catalog or a Hive metastore
  * both work.) */
object TableIO {

  /** Write `df` as a bucketed+sorted catalog table. Drops any prior
    * table AND its orphaned warehouse directory — a previous session's
    * managed-table location survives the in-memory catalog and would
    * fail the create with LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Write `df` partitioned by low-cardinality columns (partition
    * pruning on read). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       codec: String = "snappy"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", codec)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
