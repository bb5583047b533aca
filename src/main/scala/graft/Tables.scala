package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet tables (TESTDATA.md /
  * FIXTURES.md §B). One accessor per table so every query shares the
  * same normalization.
  *
  * The only normalization applied is `events.ts`: the file stores
  * TIMESTAMP(NANOS) which Spark's TimestampType (micros) cannot hold.
  * With `spark.sql.legacy.parquet.nanosAsLong=true` the column reads as
  * Long nanos; we floor-divide to micros — identical semantics to
  * DuckDB's `CAST(ts AS TIMESTAMP)` on a TIMESTAMP_NS column.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Fixture DataFrames are cached per (session, dir, table): the
    * fixtures are read-only, so the file listing + footer schema read
    * that `spark.read.parquet` performs eagerly never changes — but it
    * costs tens of ms per table per call, and every declared query
    * re-reads its inputs through here (a full Verify/Bench pass makes
    * hundreds of such calls). The cached plan is immutable and safe to
    * share across queries; sessions per JVM are few, so the strong
    * keys don't accumulate. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def read(s: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((s, dir, name), _ => s.read.parquet(path(dir, name)))

  def region(s: SparkSession, dir: String): DataFrame   = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")

  /** Register every fixture table as a temp view (SQL entry path).
    * `events` is registered in its normalized (µs ntz) form. */
  def registerAll(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => read(s, dir, t).createOrReplaceTempView(t))
    events(s, dir).createOrReplaceTempView("events")
  }

  /** `events` with `ts` as proper TimestampType (micros, UTC). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = read(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanosAsLong path: Long nanos -> micros -> timestamp
        // Final cast to TIMESTAMP_NTZ (identity under the UTC session)
        // so outputs round-trip through parquet as naive timestamps,
        // exactly like the other tables' columns.
        // Integer division (`div`), NOT `/`: epoch-nanos ≈ 1.7e18
        // exceeds double's 2^53 mantissa, so float division would lose
        // microsecond precision.
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => raw // already a timestamp type
    }
  }
}
