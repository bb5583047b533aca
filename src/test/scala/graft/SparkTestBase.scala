package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (lazy; GraftSession.getOrCreate
  * reuses the same session across suites in one JVM run). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cpus = 4, shufflePartitions = 8)
  val sf: String = "/root/testdata/sf0.001"

  def run(name: String): org.apache.spark.sql.DataFrame =
    SparkEntry.queries(name)(spark, sf)

  /** Build a fixture with the PRE-round-14 write layout (one file per
    * input partition): the staged-write path now sizes output files to
    * `spark.graft.write.targetFileBytes` (guide §6), which folds a
    * tiny fixture into ONE file — specs that exercise multi-file
    * behavior (manifest pruning, CoW rewrite granularity, compaction)
    * pin their layout explicitly through this instead of relying on
    * the write path staying naive. */
  def withMultiFileWrites[T](f: => T): T = {
    val k = "spark.graft.write.targetFileBytes"
    val prior = spark.conf.getOption(k)
    spark.conf.set(k, "1")
    try f finally prior match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }
}
