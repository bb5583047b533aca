package graft

import org.apache.spark.sql.functions._

/** Spark-side guards for the Spark-4 SQL-surface queries (exact value
  * checks against DuckDB run driver-side). */
class ModernSqlSpec extends SparkTestBase {

  test("q151 regression stats: r2 in [0,1], slope finite") {
    val rows = run("q151_regr_stats").collect()
    assert(rows.length == 3) // A/N/R returnflags
    rows.foreach { r =>
      val r2 = r.getAs[Long]("r2_nano")
      assert(r2 >= 0L && r2 <= 1000000000L, s"r2_nano out of [0,1e9]: $r2")
    }
  }

  test("q152 ordered-set aggs: q1 <= median <= q3") {
    run("q152_ordered_set_aggs").collect().foreach { r =>
      val (q1, med, q3) = (r.getAs[Double]("q1_disc"),
        r.getAs[Double]("med_qty"), r.getAs[Double]("q3_cont"))
      assert(q1 <= med && med <= q3, s"percentile order violated: $q1 $med $q3")
    }
  }

  test("q153 listagg concatenates every nation exactly once") {
    val rows = run("q153_listagg").collect()
    val all = rows.flatMap(_.getAs[String]("nations").split(","))
    assert(all.length == 25 && all.distinct.length == 25)
    // within-group ORDER BY: each region's list is sorted
    rows.foreach { r =>
      val ns = r.getAs[String]("nations").split(",")
      assert(ns.sameElements(ns.sorted))
    }
  }

  test("q154 variant extraction: k matches json path, missing is NULL") {
    val rows = run("q154_variant_extract").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.isNullAt(2))) // '$.missing' absent everywhere
    val direct = Tables.events(spark, sf)
      .filter(col("event_id") < 200)
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach(r => assert(r.getInt(1) == direct(r.getLong(0))))
  }

  test("q155 SQL UDF inlines to the q06 charge expression") {
    val udf = run("q155_sql_udf").collect()
    val q06 = run("q06_projection").collect()
    assert(udf.map(_.getAs[Double]("charge")).sameElements(
      q06.map(_.getAs[Double]("charge"))))
  }

  test("q161 window distinct count equals groupBy countDistinct") {
    val win = run("q161_window_distinct").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val agg = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").cast("int").as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(win == agg)
  }

  test("q163 arg extremes pick values at the orderkey extremes") {
    val rows = run("q163_arg_extremes").collect()
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")
      .collect().groupBy(_.getLong(0))
    rows.take(50).foreach { r =>
      val g = orders(r.getLong(0)).sortBy(_.getLong(1))
      assert(r.getAs[String]("latest_status") == g.last.getString(2))
      assert(r.getAs[Double]("first_price") == g.head.getDouble(3))
    }
  }

  test("q164 gap-fill emits every day of Q1-1995 with zero-filled gaps") {
    val rows = run("q164_date_gapfill").collect()
    assert(rows.length == 90) // Jan(31) + Feb(28) + Mar(31)
    assert(rows.exists(_.getAs[Long]("n") == 0L)) // sf0.001 has gaps
    // conservation: filled totals sum to the plain aggregate
    val total = rows.map(_.getAs[Long]("n")).sum
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp_ntz")).count()
    assert(total == expected)
  }
}
