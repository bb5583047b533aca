package graft.sources

import graft.SparkTestBase

/** CREATE TABLE AS SELECT (and REPLACE TABLE AS SELECT) through the
  * graft catalog: Spark's non-atomic CTAS/RTAS exec path creates the
  * table via the catalog, then routes the query result through the
  * DSv2 write — RTAS lands as an overwrite on a never-committed table,
  * which commits as the first append (round-9 fix; it refused before).
  */
class CtasProbeSpec extends SparkTestBase {

  test("CTAS creates and fills in one statement; RTAS and CREATE OR REPLACE swap content") {
    spark.sql("DROP NAMESPACE IF EXISTS graft.ctasspec CASCADE")
    spark.sql("CREATE NAMESPACE graft.ctasspec")
    spark.sql(
      "CREATE TABLE graft.ctasspec.t AS SELECT id, id * 2 AS v FROM range(0, 100)")
    assert(spark.table("graft.ctasspec.t").count() == 100)
    assert(spark.table("graft.ctasspec.t").columns.toSeq == Seq("id", "v"))
    // RTAS: table dropped + recreated + refilled; new schema wins
    spark.sql("REPLACE TABLE graft.ctasspec.t AS SELECT id AS k FROM range(0, 50)")
    assert(spark.table("graft.ctasspec.t").columns.toSeq == Seq("k"))
    assert(spark.table("graft.ctasspec.t").count() == 50)
    spark.sql(
      "CREATE OR REPLACE TABLE graft.ctasspec.t AS SELECT id AS k FROM range(0, 25)")
    assert(spark.table("graft.ctasspec.t").count() == 25)
    // a replaced table starts a fresh history: the RTAS write is v0
    val rows = spark.sql(
      "SELECT count(*) AS c FROM graft.ctasspec.t VERSION AS OF 0").head()
    assert(rows.getLong(0) == 25)
  }

  test("partitioned CTAS declares identity partitioning and prunes") {
    spark.sql("DROP NAMESPACE IF EXISTS graft.ctasp CASCADE")
    spark.sql("CREATE NAMESPACE graft.ctasp")
    spark.sql(
      """CREATE TABLE graft.ctasp.p PARTITIONED BY (topic) AS
        |SELECT id, concat('t', id % 3) AS topic FROM range(0, 90)""".stripMargin)
    assert(spark.table("graft.ctasp.p").count() == 90)
    assert(spark.table("graft.ctasp.p")
      .filter(org.apache.spark.sql.functions.col("topic") === "t1").count() == 30)
  }
}
