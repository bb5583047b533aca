package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewTools

/** Salted operators must be pure rewrites: identical results to the
  * unsalted forms on skewed data. */
class SkewSpec extends SparkTestBase {

  // 90% of rows on one hot key + uniform tail
  private lazy val skewed = spark.range(0, 20000).toDF("i")
    .select(when(col("i") % 10 =!= 0, 1L).otherwise(col("i") % 100).as("k"),
      col("i").as("v"))

  private lazy val dim = spark.range(0, 100).toDF("dk")
    .withColumn("label", concat(lit("d"), col("dk")))

  test("salted join equals the plain join on skewed keys") {
    val plain = skewed.join(dim, col("k") === col("dk"))
      .agg(count(lit(1)), sum("v").cast("bigint"), countDistinct("label")).head()
    val salted = SkewTools.saltedJoin(skewed, dim, "k", "dk", salts = 8)
      .agg(count(lit(1)), sum("v").cast("bigint"), countDistinct("label")).head()
    assert(salted == plain)
  }

  test("salted distinct count equals countDistinct per key") {
    val plain = skewed.groupBy("k")
      .agg(countDistinct("v").as("n_distinct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewTools.saltedDistinctCount(skewed, "k", "v", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salting splits the hot key across all salt partitions") {
    val perSalt = skewed.filter(col("k") === 1L)
      .withColumn("_salt", SkewTools.salt(monotonically_increasing_id(), 8))
      .groupBy("_salt").count().collect()
    assert(perSalt.length == 8) // every salt bucket receives hot-key rows
  }
}
