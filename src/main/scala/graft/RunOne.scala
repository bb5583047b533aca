package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE declared query in a fresh session — isolated
  * timing (the bench-contamination check) and an optional formatted
  * plan dump.
  *
  * {{{ sbt "runMain graft.RunOne q55_minhash_lsh /root/testdata/sf0.1 [explain]" }}}
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    // warmup pass at the smallest SF primes codegen/listing paths
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    if (explain) df.explain("formatted")
    println(f"[runone] $name%s $sec%.3f sec ($sfDir)")
    spark.stop()
  }
}
