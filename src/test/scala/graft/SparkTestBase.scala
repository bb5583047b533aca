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
}
