package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE declared query and report how many Spark jobs it
  * launched and their wall spans — the fixed-overhead profile that
  * RunOne's single number hides (iterative operators pay per-job
  * setup; this shows where).
  *
  * {{{ sbt "runMain graft.JobCount q100_dedup_components /root/testdata/sf0.1" }}}
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val jobs = new AtomicInteger(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val jobTime = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(j.jobId, j.time); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { t0 =>
          val span = j.time - t0
          spans.add((j.jobId, span)); jobTime.addAndGet(span); ()
        }
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // let listener drain
    val detail = spans.toArray(Array.empty[(Int, Long)]).sortBy(_._1)
      .map { case (id, ms) => s"#$id:${ms}ms" }.mkString(" ")
    println(f"[jobcount] $name%s $sec%.3f sec, ${jobs.get}%d jobs, ${jobTime.get}%d ms in-job: $detail%s")
    spark.stop()
  }
}
