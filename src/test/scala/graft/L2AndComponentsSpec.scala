package graft

import org.apache.spark.sql.functions._
import graft.functions.L2Distance
import graft.operators.DedupComponents

/** L2Distance expression semantics + connected-components clustering. */
class L2AndComponentsSpec extends SparkTestBase {

  test("native L2 equals the HOF formulation bit-for-bit") {
    L2Distance.register(spark)
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val probe = e.filter(col("vec_id") === 0).select(col("v").as("pv"))
    val both = e.crossJoin(broadcast(probe)).select(
      L2Distance.l2(col("v"), col("pv")).as("native"),
      sqrt(aggregate(zip_with(col("v"), col("pv"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)).as("hof"))
    assert(both.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("L2 edge semantics: length mismatch and null element give null") {
    L2Distance.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(1.0))),
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(1.0), Some(2.0))))
      .toDF("a", "b")
    val out = df.select(L2Distance.l2(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("L2 participates in whole-stage codegen") {
    L2Distance.register(spark)
    val df = Tables.embeddings(spark, sf)
      .select(L2Distance.l2(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan.take(1000))
    assert(df.collect().forall(_.getDouble(0) == 0.0)) // self-distance exactly 0
  }

  test("components: two clusters and a chain resolve to min-id labels") {
    import spark.implicits._
    // cluster {1,2,3} (triangle), chain {10-11-12-13}, isolated pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L)).toDF("a_id", "b_id")
    val comp = DedupComponents.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(13L) == 10L)
    assert(comp(20L) == 20L && comp(21L) == 20L)
  }

  test("componentsStar agrees with components on the mixed fixture") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L)).toDF("a_id", "b_id")
    val star = DedupComponents.componentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = DedupComponents.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("componentsStar agrees with components on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }.toDF("a_id", "b_id")
    val star = DedupComponents.componentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = DedupComponents.components(pairs, maxIter = 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("componentsStar resolves a long path where propagation's round bound throws") {
    import spark.implicits._
    // a 64-node path has diameter 63: min-label propagation needs ~63
    // rounds (> maxIter=20 -> loud failure), star contraction O(log n)
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    intercept[IllegalStateException] {
      DedupComponents.components(pairs, maxIter = 20).collect()
    }
    val star = DedupComponents.componentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.keySet == (0L to 63L).toSet && star.values.forall(_ == 0L))
  }

  test("canonical: one survivor per cluster with its size") {
    import spark.implicits._
    val pairs = Seq((5L, 6L), (6L, 7L), (30L, 31L)).toDF("a_id", "b_id")
    val can = DedupComponents.canonical(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(can == Map(5L -> 3L, 30L -> 2L))
  }
}
