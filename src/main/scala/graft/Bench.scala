package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.util.QueryExecutionListener

/** Benchmark main (driver contract): run every declared query at the
  * given scale-factor dir, print ONE JSON line with per-query seconds
  * AND per-query output row counts (round-over-round diffs then catch
  * result-size regressions, not just time). Queries are fully
  * materialized through a noop sink (a bare count() could satisfy
  * scans from parquet footers and under-measure); row counts ride the
  * same execution via observe(), never a second run. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // row-count capture: observe("graft_rows") on each query, read back
    // through the execution listener (posted async — polled below)
    val observed = new AtomicLong(-1L)
    val epoch = new AtomicLong(0L)
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("graft_rows").foreach { r =>
          observed.set(r.getLong(0)); epoch.incrementAndGet(); ()
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

    // untimed warmup: JIT/codegen paths + file listing, so the first
    // measured query doesn't absorb session startup
    try {
      spark.range(100000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
      Tables.lineitem(spark, sfDir).agg(count(lit(1))).collect()
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // per-query hygiene: no cached plans/blocks may leak across
      // measurements (round 1 lost 7-25x to exactly such leakage)
      spark.catalog.clearCache()
      val before = epoch.get()
      val t0 = System.nanoTime()
      var elapsed = 0.0
      var rows = -1L
      try {
        fn(spark, sfDir).observe("graft_rows", count(lit(1)))
          .write.format("noop").mode("overwrite").save()
        elapsed = (System.nanoTime() - t0) / 1e9
        // listener posts async; the wait is OUTSIDE the timed span
        val deadline = System.currentTimeMillis() + 2000
        while (epoch.get() == before && System.currentTimeMillis() < deadline)
          Thread.sleep(10)
        if (epoch.get() != before) rows = observed.get()
      } catch { case e: Throwable =>
        elapsed = (System.nanoTime() - t0) / 1e9
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (name, elapsed, rows)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rc = results.map { case (k, _, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rc,"sf":"$sfDir"}""")
    spark.stop()
  }
}
