package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryRegistry, Tables}
import Qf._

/** Q18–Q23: aggregation surface.
  *
  * All of these are partial+final hash aggregates (map-side combine is
  * automatic), so at 100 TB the shuffle carries only one row per
  * (partition × group), never raw rows. Group-by keys here are
  * low-cardinality (flags, statuses, event types) — no skew concern.
  */
object AggQueries extends QueryRegistry {

  def defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape (the flagship).
    QueryDef("q18_groupby_multi_agg",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          // integer-micros sums (Qf.msum): exact, order-independent,
          // and codegen'd LONG adds — the decimal path cost this
          // flagship 3 s at sf0.1, the micros path is sub-second
          msum(col("l_quantity")).as("sum_qty"),
          msum(col("l_extendedprice")).as("sum_base"),
          msum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          mavg(col("l_quantity")).as("avg_qty"),
          mavg(col("l_extendedprice")).as("avg_price"),
          mavg(col("l_discount")).as("avg_disc"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
              |${sqlMsum("l_quantity")} AS sum_qty,
              |${sqlMsum("l_extendedprice")} AS sum_base,
              |${sqlMsum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
              |${sqlMsum("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
              |${sqlMavg("l_quantity")} AS avg_qty,
              |${sqlMavg("l_extendedprice")} AS avg_price,
              |${sqlMavg("l_discount")} AS avg_disc
              |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef("q19_global_agg",
      (s, dir) => Tables.lineitem(s, dir).agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship")),
      Some("""SELECT COUNT(*) AS cnt, COUNT(DISTINCT l_orderkey) AS n_orders,
             |MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship FROM lineitem""".stripMargin)),

    // Protocol headroom (sf≥1000): 1e6 rows of ~5e9-unit values make
    // the plain int64 micros sum ≈5e21 — past the 9.2e18 wrap point —
    // while msumWide's high/low word split accumulates exactly. The
    // oracle replays the identical split arithmetic (DuckDB's HUGEINT
    // sums make its side trivially exact — agreement proves the split
    // recombination, not just the sum). The signed column alternates
    // sign per row: negatives exercise the two's-complement >>/&mask
    // split cross-engine (both engines shift BIGINT arithmetically —
    // verified, not assumed).
    QueryDef("q192_wide_sum_headroom",
      (s, _) => s.range(0, 1000000)
        .select((lit(5.0e9) + col("id").cast("double")).as("x"),
          (when(col("id") % 2 === 0, lit(1.0)).otherwise(lit(-1.0)) *
            (lit(2.5e9) + col("id").cast("double"))).as("xs"))
        .agg(Qf.msumWide(col("x")).as("total"),
          Qf.msumWide(col("xs")).as("total_signed"),
          count(lit(1)).as("cnt")),
      Some(s"""SELECT ${Qf.sqlMsumWide("5e9 + CAST(id AS DOUBLE)")} AS total,
              |${Qf.sqlMsumWide(
                "(CASE WHEN id % 2 = 0 THEN 1.0 ELSE -1.0 END) * (2.5e9 + CAST(id AS DOUBLE))")} AS total_signed,
              |COUNT(*) AS cnt FROM range(0, 1000000) t(id)""".stripMargin)),

    QueryDef("q20_distinct_agg",
      (s, dir) => Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    QueryDef("q21_rollup",
      (s, dir) => Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"))
        .orderBy(col("g_status"), col("g_priority"),
          col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
              |${sqlDsum("o_totalprice")} AS sum_price,
              |CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
              |CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
              |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
              |ORDER BY g_status, g_priority,
              |o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    QueryDef("q21_cube",
      (s, dir) => Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("sum_price"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"))
        .orderBy(col("g_status"), col("g_priority"),
          col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
              |${sqlDsum("o_totalprice")} AS sum_price,
              |CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
              |CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
              |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
              |ORDER BY g_status, g_priority,
              |o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // HLL sketch values differ across engines, so the declared ±5%
    // property IS the output: the driver verifies `within_5pct` (and
    // the exact count) against the oracle's constant-true twin. The
    // raw sketch value keeps its own assertion in the test suite.
    // rsd=0.02: the default 0.05 sketch drifts past 5% at small SFs
    // (measured 6.4% at sf0.001); 0.02 measures ≤0.5% at every SF.
    QueryDef("q22_approx_distinct",
      (s, dir) => {
        // two single-row aggs, crossed: combining countDistinct with
        // another aggregate makes Catalyst key the partial stage by the
        // distinct column, allocating one HLL++ buffer PER KEY for the
        // approx side (measured 3.1 s at sf0.1 — buffer churn, not IO);
        // split, each pass is a plain column scan (1.1 s)
        val li = Tables.lineitem(s, dir)
        val approx = li.agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
        val exact = li.select("l_orderkey").distinct()
          .agg(count(lit(1)).as("exact_orders"))
        exact.crossJoin(approx).select(
          col("exact_orders"),
          (abs(col("approx_orders") - col("exact_orders")) <=
            col("exact_orders") * lit(0.05)).as("within_5pct"))
      },
      Some("""SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
             |TRUE AS within_5pct FROM lineitem""".stripMargin)),

    // pivot: event counts per user as one column per type (fixed value
    // list → deterministic schema; Spark leaves empty cells null,
    // matched by NULLIF(count,0) in the oracle)
    QueryDef("q82_pivot",
      (s, dir) => Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .orderBy("user_id")
        .limit(200),
      Some("""SELECT user_id,
             |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS click,
             |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS view,
             |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchase,
             |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'signup'), 0) AS signup,
             |  NULLIF(COUNT(*) FILTER (WHERE event_type = 'error'), 0) AS error
             |FROM events GROUP BY user_id ORDER BY user_id LIMIT 200""".stripMargin)),

    // exact interpolated percentiles; ROUND(x*1e3)→BIGINT absorbs any
    // last-ulp interpolation-formula difference between engines (the
    // 2-dp inputs make interpolated values exact at 3 decimals, so the
    // scaled value is integral — never at a rounding tie). DECIMAL
    // outputs are banned (round-1 gate lesson).
    QueryDef("q86_percentile",
      (s, dir) => Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)") * lit(1e3)).cast("long").as("median_milli"),
          round(expr("percentile(o_totalprice, 0.9)") * lit(1e3)).cast("long").as("p90_milli"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |  CAST(ROUND(quantile_cont(o_totalprice, 0.5) * 1e3) AS BIGINT) AS median_milli,
             |  CAST(ROUND(quantile_cont(o_totalprice, 0.9) * 1e3) AS BIGINT) AS p90_milli
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Statistical aggregates (corr / covariance / stddev): the engines'
    // merge formulas differ at ~1e-12 relative, so outputs are scaled
    // ROUND→BIGINT (absorbs far more than the divergence); Spark yields
    // NaN where DuckDB yields NULL on degenerate groups → NaN mapped to
    // NULL so both agree.
    QueryDef("q102_stats_agg",
      (s, dir) => {
        def nn(c: org.apache.spark.sql.Column) = when(isnan(c), lit(null)).otherwise(c)
        Tables.events(s, dir)
          .select(col("event_type"), col("value"),
            get_json_object(col("props"), "$.k").cast("int").cast("double").as("k"))
          .groupBy("event_type")
          .agg(
            round(nn(corr(col("value"), col("k"))) * lit(1e9)).cast("long").as("corr_nano"),
            round(nn(covar_samp(col("value"), col("k"))) * lit(1e6)).cast("long").as("covar_micro"),
            round(nn(stddev_samp(col("value"))) * lit(1e6)).cast("long").as("stddev_micro"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(ROUND(corr(value, k) * 1e9) AS BIGINT) AS corr_nano,
             |  CAST(ROUND(covar_samp(value, k) * 1e6) AS BIGINT) AS covar_micro,
             |  CAST(ROUND(stddev_samp(value) * 1e6) AS BIGINT) AS stddev_micro
             |FROM (SELECT event_type, value,
             |        CAST(CAST(json_extract_string(props,'$.k') AS INT) AS DOUBLE) AS k
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // approx_percentile (t-digest-style sketch): like q22, the sketch
    // value differs across engines, so the declared tolerance property
    // is the driver-visible output alongside the exact milli-scaled
    // percentile (q86's proven absorber).
    QueryDef("q108_approx_percentile",
      (s, dir) => Tables.orders(s, dir).agg(
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx"),
          expr("percentile(o_totalprice, 0.5)").as("exact"))
        .select(
          round(col("exact") * lit(1e3)).cast("long").as("exact_milli"),
          (abs(col("approx") - col("exact")) <= col("exact") * lit(0.02)).as("within_2pct")),
      Some("""SELECT CAST(ROUND(quantile_cont(o_totalprice, 0.5) * 1e3) AS BIGINT) AS exact_milli,
             |TRUE AS within_2pct FROM orders""".stripMargin)),

    // UNPIVOT (the inverse reshape of q82): wide metric columns melt
    // into (key, metric, value) rows via the native Dataset.unpivot —
    // a generate, not a shuffle.
    QueryDef("q121_unpivot",
      (s, dir) => Tables.orders(s, dir)
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_custkey").cast("double").as("o_custkey_d"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("o_totalprice"), col("o_custkey_d")), "metric", "value")
        .orderBy("o_orderkey", "metric"),
      Some("""SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value
             |FROM orders WHERE o_orderkey < 100
             |UNION ALL
             |SELECT o_orderkey, 'o_custkey_d', CAST(o_custkey AS DOUBLE)
             |FROM orders WHERE o_orderkey < 100
             |ORDER BY o_orderkey, metric""".stripMargin)),

    // Count-min sketch: the sketch is engine-specific, so (as with
    // q22's HLL) the declared PROPERTY is the output — for the top-5
    // hottest keys the fixed-seed estimate never undercounts and stays
    // within the eps·N overcount bound. The single sketch crossing the
    // driver is one binary value (metadata scale).
    QueryDef("q122_countmin_property",
      (s, dir) => {
        import s.implicits._
        val eps = 0.001
        val events = Tables.events(s, dir)
        val skBytes = events.agg(
          expr(s"count_min_sketch(user_id, ${eps}d, 0.99d, 42)").as("sk"))
          .head().getAs[Array[Byte]]("sk")
        val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(skBytes))
        val total = events.count()
        val bound = math.ceil(eps * total).toLong
        events.groupBy("user_id").agg(count(lit(1)).as("exact"))
          .orderBy(col("exact").desc, col("user_id")).limit(5)
          .collect().map { r =>
            val (u, exact) = (r.getLong(0), r.getLong(1))
            val est = sketch.estimateCount(u)
            (u, exact, est >= exact && est <= exact + bound)
          }.toSeq.toDF("user_id", "exact", "bounded")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, exact, TRUE AS bounded FROM (
             |  SELECT user_id, COUNT(*) AS exact FROM events GROUP BY user_id
             |  ORDER BY exact DESC, user_id LIMIT 5)
             |ORDER BY user_id""".stripMargin)),

    // Bloom filter membership contract (the sketch behind the engine's
    // runtime join pruning, driven through the public stat API — the
    // SQL bloom_filter_agg/might_contain pair is internal-only): zero
    // false negatives on every present key, and the false-positive
    // rate on a disjoint probe range stays within the sizing bound.
    // The probe is a closure over the driver-built sketch — one bloom
    // object broadcast, never a per-row driver call. The filter is
    // sized from the live row count, not a constant: a fixed capacity
    // saturates the moment the table outgrows it (caught live at sf1,
    // where a 200k-capacity bloom over 1.5M orders blew the fp bound)
    // — 3% target fpp, asserted with 4x headroom.
    QueryDef("q123_bloom_property",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val bf = orders.stat.bloomFilter(
          "o_orderkey", math.max(orders.count(), 1L), 0.03)
        val probe = udf((x: Long) => bf.mightContainLong(x))
        val present = orders
          .agg((sum(when(probe(col("o_orderkey")), 0).otherwise(1)) === 0).as("ok"))
          .select(lit("present_all_found").as("contract"), col("ok"))
        val fp = s.range(1000000000L, 1000100000L).toDF("k")
          .agg((sum(when(probe(col("k")), 1).otherwise(0)) <=
            lit((0.12 * 100000).toLong)).as("ok"))
          .select(lit("fp_rate_bounded").as("contract"), col("ok"))
        present.unionAll(fp).orderBy("contract")
      },
      Some("""SELECT 'fp_rate_bounded' AS contract, TRUE AS ok
             |UNION ALL SELECT 'present_all_found', TRUE
             |ORDER BY contract""".stripMargin)),

    // Mergeable distinct-count sketches (Apache DataSketches HLL via
    // Spark 4's hll_sketch_agg/hll_union_agg): one sketch per nation
    // partial, then a union of the 25 sketches — the 100 TB pattern
    // where per-partition/per-day sketches are persisted once and
    // unioned in O(sketch bytes) instead of re-shuffling raw keys for
    // every COUNT(DISTINCT) consumer. lgConfigK=14 → ~0.8% RSE; the
    // contract asserts a 5% envelope against the exact count computed
    // in the same job (sketches are deterministic for fixed input, so
    // the boolean is stable run-over-run).
    QueryDef("q166_hll_sketch_union",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val est = c.groupBy("c_nationkey")
          .agg(expr("hll_sketch_agg(c_custkey, 14)").as("sk"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est"))
        val exact = c.agg(count_distinct(col("c_custkey")).as("exact_distinct"))
        est.crossJoin(exact).select(
          col("exact_distinct"),
          (abs(col("est") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05).as("within_5pct"))
      },
      Some("SELECT COUNT(DISTINCT c_custkey) AS exact_distinct, TRUE AS within_5pct FROM customer")),

    // Mergeable heavy-hitters (DataSketches frequent-items behind
    // Spark 4's approx_top_k_*): per-day partial sketches, combined
    // then estimated — the streaming/partitioned top-k shape where
    // each ingest slice keeps a tiny sketch and the global answer is
    // a sketch merge, never a full re-count. event_type has 5 distinct
    // values ≪ maxItemsTracked, so the sketch is exact here and the
    // oracle is the plain GROUP BY — at real cardinality the same plan
    // degrades gracefully to ε-approximate counts.
    QueryDef("q167_approx_top_k",
      (s, dir) => Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(expr("approx_top_k_accumulate(event_type, 10)").as("state"))
        .agg(expr("approx_top_k_estimate(approx_top_k_combine(state, 64), 5)").as("topk"))
        .select(explode(col("topk")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("event_type")),
      Some("SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type ORDER BY cnt DESC, event_type")),

    QueryDef("q23_filtered_agg",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          count(when(col("value") > 100, 1)).as("cnt_big"),
          sum(when(col("value") > 100, col("value").cast(D386))).cast(D186).cast("double").as("sum_big"),
          dsum(col("value")).as("sum_all"))
        .orderBy("event_type"),
      Some(s"""SELECT event_type, COUNT(*) AS cnt,
              |COUNT(*) FILTER (WHERE value > 100) AS cnt_big,
              |CAST(SUM(CAST(FLOOR((value) * 1e6 + 0.5) AS BIGINT)) FILTER (WHERE value > 100) AS DOUBLE) / 1e6 AS sum_big,
              |${sqlDsum("value")} AS sum_all
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
