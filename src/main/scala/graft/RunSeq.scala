package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run a comma-separated list of declared queries in ONE
  * session, in the given order, timing each — separates fresh-JVM /
  * cold-FS cost from steady-state cost (RunOne can't: one query per
  * JVM), and reproduces bench-context ordering effects (Bench runs
  * the registry lexicographically in a single session).
  *
  * {{{ sbt "runMain graft.RunSeq q288_replace_where,q288_replace_where /root/testdata/sf0.1" }}}
  */
object RunSeq {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup discipline as RunOne: prime codegen/listing paths
    names.distinct.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    names.zipWithIndex.foreach { case (n, i) =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[runseq] #$i%d $n%s $sec%.3f sec ($sfDir)")
    }
    spark.stop()
  }
}
