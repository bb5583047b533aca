package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make the native functions resolvable in a
  * fresh session without per-session registration calls. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions installs graft_cosine and graft_tokenize") {
    // getOrCreate would return the suite-shared session (extensions
    // apply only at build time) — clear defaults to force a fresh
    // SparkSession over the same SparkContext, and restore after.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions))
      .getOrCreate()
    try {
      val cos = spark.sql(
        "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s").head().getDouble(0)
      assert(cos == 1.0)
      val toks = spark.sql(
        "SELECT graft_tokenize('a b c')").collect().map(_.getString(0))
      assert(toks.sameElements(Array("a", "b", "c")))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
