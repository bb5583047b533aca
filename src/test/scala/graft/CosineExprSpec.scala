package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** The native Expression must be a bit-identical, codegen'd drop-in
  * for the HOF formulation. */
class CosineExprSpec extends SparkTestBase {

  test("native cosine equals HOF cosine bit-for-bit on all pairs") {
    val native = run("q65_cosine_native").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim"))
    val hof = run("q40_cosine_topk").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim"))
    assert(native.sameElements(hof))
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    import graft.functions.CosineSimilarity.cosine
    CosineSimilarity.register(spark)
    val df = Tables.embeddings(spark, sf)
      .select(cosine(col("embedding"), col("embedding")).as("sim"))
    val plan = df.queryExecution.executedPlan.toString
    // WSCG renders as a "*(n) " prefix on the Project node
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan.take(1000))
    // self-similarity is exactly 1.0 wherever the norm is nonzero
    val sims = df.collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("SQL registration: graft_cosine callable from spark.sql") {
    CosineSimilarity.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT graft_cosine(CAST(embedding AS ARRAY<DOUBLE>),
        |                    CAST(embedding AS ARRAY<DOUBLE>)) AS s
        |FROM emb LIMIT 5""".stripMargin).collect()
    assert(r.nonEmpty && r.forall(x => math.abs(x.getDouble(0) - 1.0) < 1e-12))
  }

  test("null inputs propagate null") {
    import graft.functions.CosineSimilarity.cosine
    CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    val out = df.select(cosine(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }
}
