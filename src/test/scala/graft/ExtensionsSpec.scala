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
      // FuseDotProduct: on a non-foldable (table-backed) input the HOF
      // idiom plans as the fused expression...
      Tables.embeddings(spark, "/root/testdata/sf0.001")
        .createOrReplaceTempView("emb_ext")
      val fused = spark.sql(
        """SELECT aggregate(zip_with(v, v, (x, y) -> x * y), 0.0d, (acc, w) -> acc + w) AS dot
          |FROM (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS v FROM emb_ext)""".stripMargin)
      assert(fused.queryExecution.optimizedPlan.toString.contains("dotproduct"),
        fused.queryExecution.optimizedPlan.toString.take(800))
      // ...matching the un-fused evaluation bit-for-bit
      val viaLit = spark.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS dot
          |FROM VALUES (array(1.0d,2.0d,3.0d), array(4.0d,5.0d,6.0d)) t(a, b)""".stripMargin)
      assert(viaLit.head().getDouble(0) == (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
      // ...with HOF null semantics preserved: length mismatch → null
      val mismatch = spark.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS dot
          |FROM VALUES (array(1.0d,2.0d), array(4.0d)) t(a, b)""".stripMargin)
      assert(mismatch.head().isNullAt(0))
      // null element → null
      val nullElem = spark.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS dot
          |FROM VALUES (array(1.0d, cast(null as double)), array(4.0d, 5.0d)) t(a, b)""".stripMargin)
      assert(nullElem.head().isNullAt(0))
      // a non-matching fold (different seed) is left alone
      val other = spark.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 1.0d, (acc, v) -> acc + v) AS dot
          |FROM VALUES (array(1.0d,2.0d), array(4.0d,5.0d)) t(a, b)""".stripMargin)
      assert(!other.queryExecution.optimizedPlan.toString.contains("dotproduct"))
      assert(other.head().getDouble(0) == 1.0 + 4.0 + 10.0)
      // FuseCosine: the full dot/sqrt(dot*dot) idiom collapses to ONE
      // CosineSimilarity (no residual DotProduct), bit-equal to the
      // registered native function
      def hofDot(x: String, y: String) =
        s"aggregate(zip_with($x, $y, (p, q) -> p * q), 0.0d, (acc, w) -> acc + w)"
      val cosSql = spark.sql(
        s"""SELECT ${hofDot("v", "w")} / sqrt(${hofDot("v", "v")} * ${hofDot("w", "w")}) AS sim,
           |       graft_cosine(v, w) AS native
           |FROM (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS v,
           |             CAST(reverse(embedding) AS ARRAY<DOUBLE>) AS w
           |      FROM emb_ext)""".stripMargin)
      val opt = cosSql.queryExecution.optimizedPlan.toString
      assert(opt.contains("cosinesimilarity"), opt.take(800))
      assert(!opt.toLowerCase.contains("zip_with"), opt.take(800))
      assert(cosSql.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
