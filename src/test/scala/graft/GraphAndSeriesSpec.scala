package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-1 round-6 additions: graph decomposition and time-series
  * scoring. Each test proves the property the query's static unrolling
  * or closed form RELIES on — not just output spot values.
  */
class GraphAndSeriesSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("q250: 8-round peel reaches the 2-core fixpoint on the fixtures") {
    // peel to fixpoint with a dynamic loop; the declared query unrolls
    // a fixed 8 rounds — valid iff fixpoint is reached by then.
    val ids = Tables.documents(spark, sf01)
      .filter(col("doc_id") >= 1).select(col("doc_id").as("i"))
    val ed = ids.select(col("i").as("u"), expr("i div 2").as("v"))
      .unionAll(ids.filter(col("i") >= 10)
        .select(col("i").as("u"), expr("i div 10").as("v")))
      .filter(col("u") =!= col("v")).distinct()
    var edges = ed.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(ed.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint() // cut the growing lineage in the test loop
    var rounds = 0
    var stable = false
    while (!stable && rounds < 20) {
      val alive = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2).select("src")
      val next = edges
        .join(alive, "src", "left_semi")
        .join(alive.withColumnRenamed("src", "dst"), "dst", "left_semi")
        .localCheckpoint()
      stable = next.count() == edges.count()
      edges = next
      rounds += 1
    }
    assert(stable, "peeling did not converge in 20 rounds")
    assert(rounds <= 8, s"fixpoint took $rounds rounds > unrolled 8")
    // and the declared query's output equals the fixpoint core
    val fix = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q = SparkEntry.queries("q250_kcore")(spark, sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q == fix)
    assert(fix.nonEmpty && fix.valuesIterator.forall(_ >= 2))
  }

  test("q251: closed-form CUSUM equals the sequential recursion") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("ts"),
        expr("cast(floor(value * 1e6 + 0.5) as bigint)").as("v"))
    val st = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val closed = ev.join(st, "event_type")
      .withColumn("y", col("v") - expr("sv div n"))
      .withColumn("p", sum("y").over(w))
      .withColumn("s_plus", col("p") - least(lit(0L), min("p").over(w)))
      .orderBy("event_type", "ts", "event_id")
      .select("event_type", "y", "s_plus")
      .collect()
    var cur = ("", 0L)
    closed.foreach { r =>
      val (tpe, y, sPlus) = (r.getString(0), r.getLong(1), r.getLong(2))
      val s0 = if (tpe == cur._1) cur._2 else 0L
      val expect = math.max(0L, s0 + y)
      assert(sPlus == expect, s"$tpe: closed $sPlus != recursive $expect")
      cur = (tpe, expect)
    }
  }

  test("q252: bidirectional edge list makes the statistics symmetric") {
    val r = SparkEntry.queries("q252_assortativity")(spark, sf01).collect()(0)
    val (m, sx, sy) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (sxy, sxx, syy) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(sx == sy && sxx == syy,
      "src/dst degree sums must agree on a symmetrized edge list")
    // Combine the raw sufficient statistics the way a consumer would
    // (wide arithmetic lives with the consumer, not the int64 plan):
    // Cauchy-Schwarz on the implied Pearson terms => |r| <= 1.
    val num = m.toDouble * sxy - sx.toDouble * sy
    val denX = m.toDouble * sxx - sx.toDouble * sx
    val denY = m.toDouble * syy - sy.toDouble * sy
    assert(num * num <= denX * denY * (1 + 1e-12))
    assert(m > 0 && sxy > 0)
  }

  test("q253: scaled features stay inside their declared ranges") {
    val rows = SparkEntry.queries("q253_feature_scaling")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mm = r.getLong(3)
      assert(mm >= 0L && mm <= 1000000L, s"minmax_ppm $mm out of [0, 1e6]")
      val c = r.getLong(4)
      assert(c >= -1000000L && c <= 1000000L, s"centered_ppm $c out of range")
    }
  }
}
