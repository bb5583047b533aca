package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE declared query and print, per Spark job, its call
  * site, start offset, duration, and the DRIVER GAP since the previous
  * job ended — the attribution JobCount's totals hide (which driver
  * phase the between-job wall goes to).
  *
  * {{{ sbt "runMain graft.GapProf q305_dml_correlated /root/testdata/sf0.1" }}}
  */
object GapProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.constraintPropagation.enabled", sys.env.getOrElse("GRAFT_CP", "true")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    case class J(id: Int, start: Long, site: String)
    val started = new ConcurrentHashMap[Int, J]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(J, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties).flatMap { p =>
          val d = Option(p.getProperty("spark.job.description")).filter(_.trim.nonEmpty)
          val c = Option(p.getProperty("callSite.short")).filter(_.trim.nonEmpty)
          (d, c) match {
            case (Some(x), Some(y)) => Some(s"$x | $y")
            case (x, y) => x.orElse(y)
          }
        }.getOrElse("?")
        val stages = j.stageInfos.map(s => s"${s.name.takeWhile(_ != '(')}:${s.numTasks}")
          .mkString(" ")
        started.put(j.jobId, J(j.jobId, j.time, s"$site [$stages]")); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(started.get(j.jobId)).foreach(s => done.add((s, j.time))); ()
      }
    })
    val t0 = System.currentTimeMillis()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = System.currentTimeMillis() - t0
    Thread.sleep(300)
    val js = done.toArray(Array.empty[(J, Long)]).sortBy(_._1.start)
    var prevEnd = t0
    var gapSum = 0L
    js.foreach { case (j, end) =>
      val gap = j.start - prevEnd
      gapSum += math.max(0L, gap)
      println(f"[gap] +${gap}%5d ms gap | job#${j.id}%3d ${end - j.start}%5d ms @${j.start - t0}%6d ms  ${j.site}%s")
      prevEnd = math.max(prevEnd, end)
    }
    println(f"[gap] TOTAL wall ${wall}%d ms, jobs ${js.length}%d, gap-sum ${gapSum}%d ms, tail ${t0 + wall - prevEnd}%d ms")
    spark.stop()
  }
}
