package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, QueryRegistry, Tables}

/** Spark-4-era SQL surface: ordered-set aggregates, VARIANT, SQL-macro
  * UDFs, arg-extremes, portable regression statistics, window distinct
  * counting, and calendar gap-fill. Where the dialects agree the same
  * text runs on both engines; where they diverge (listagg vs
  * string_agg, sequence vs generate_series, variant vs json_extract)
  * the oracle states the DuckDB equivalent and the outputs must still
  * be bit-identical.
  *
  * Scale notes: every query here is a single scan + one hash
  * aggregation (or window over a bounded group) — no shape grows
  * super-linearly. Regression stats deliberately avoid the built-in
  * regr_* aggregates: those accumulate raw doubles in partition order
  * (non-deterministic across retries/partitionings at 100 TB); the
  * decimal-sum funnel keeps every moment exact and order-independent,
  * then derives the coefficients with bit-deterministic IEEE double
  * arithmetic.
  */
object ModernSqlQueries extends QueryRegistry {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q) }

  private def sqlBoth(q: String): ((SparkSession, String) => DataFrame, Option[String]) =
    (sql(q), Some(q))

  def defs: Seq[QueryDef] = Seq(

    // Linear regression per group WITHOUT regr_* (order-dependent
    // double sums): order-independent moments -> double coefficients.
    // Moments are BIGINT sums of per-row integer micro/cent units —
    // each row's unit value is the same IEEE double rounded the same
    // way on both engines, and long addition is exact in any order, so
    // the moments are bit-deterministic AND stay in whole-stage
    // codegen (the previous DECIMAL(38,6) sums ran the BigDecimal slow
    // path: 4.5 s -> this shape is a plain long-sum scan). Headroom:
    // the largest term (price² cents ≈ 1.1e12) sums to ~6.6e18 at sf1,
    // inside int64; beyond sf1 re-split the squared moments. The
    // coefficients still funnel through the proven ROUND(x*10^k)->
    // BIGINT absorber (q86's pattern) — nano-precision, portable.
    QueryDef("q151_regr_stats", sqlBoth(
      """WITH t AS (
        |  SELECT l_returnflag,
        |    CAST(FLOOR(l_quantity * 1e6 + 0.5) AS BIGINT) AS q_micro,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS p_cents,
        |    CAST(FLOOR(l_quantity * l_quantity * 1e6 + 0.5) AS BIGINT) AS qq_micro,
        |    CAST(FLOOR(l_extendedprice * l_extendedprice * 100 + 0.5) AS BIGINT) AS pp_cents,
        |    CAST(FLOOR(l_quantity * l_extendedprice * 100 + 0.5) AS BIGINT) AS qp_cents
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(q_micro) AS DOUBLE) / 1e6 AS sx,
        |    CAST(SUM(p_cents) AS DOUBLE) / 1e2 AS sy,
        |    CAST(SUM(qq_micro) AS DOUBLE) / 1e6 AS sxx,
        |    CAST(SUM(pp_cents) AS DOUBLE) / 1e2 AS syy,
        |    CAST(SUM(qp_cents) AS DOUBLE) / 1e2 AS sxy
        |  FROM t GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  CAST(ROUND(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1e6) AS BIGINT) AS slope_micro,
        |  CAST(ROUND(((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n) * 1e6) AS BIGINT) AS intercept_micro,
        |  CAST(ROUND((((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1e9) AS BIGINT) AS r2_nano
        |FROM m ORDER BY l_returnflag""".stripMargin)),

    // Ordered-set aggregates: exact median + discrete/continuous
    // percentiles (identical names and WITHIN GROUP syntax both
    // engines; l_quantity is integral-valued DOUBLE so interpolation
    // midpoints are exact in binary).
    QueryDef("q152_ordered_set_aggs", sqlBoth(
      """SELECT l_returnflag,
        |  median(l_quantity) AS med_qty,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1_disc,
        |  percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q3_cont
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // listagg (Spark 4) vs string_agg(... ORDER BY) (DuckDB): ordered
    // string concatenation per group — deterministic because the
    // within-group order is total (n_name is unique per region).
    QueryDef("q153_listagg", sql(
      """SELECT r_name, listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM region JOIN nation ON r_regionkey = n_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // VARIANT ingestion (Spark 4's semi-structured type): parse once,
    // extract typed fields; missing paths yield NULL, not errors.
    // DuckDB replays through its JSON type. At scale the parse
    // happens once per row in the scan projection — no shredding
    // tables, no UDF.
    QueryDef("q154_variant_extract", sql(
      """SELECT event_id,
        |  variant_get(parse_json(props), '$.k', 'int') AS k,
        |  variant_get(parse_json(props), '$.missing', 'string') AS missing
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin),
      Some("""SELECT event_id,
             |  CAST(json_extract(props, '$.k') AS INT) AS k,
             |  CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
             |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin)),

    // Declarative SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr):
    // the body inlines into the plan (stays inside whole-stage
    // codegen, unlike a JVM closure UDF). The oracle states the
    // inlined expression — equality IS the inlining proof.
    QueryDef("q155_sql_udf", (s: SparkSession, dir: String) => {
      Tables.registerAll(s, dir)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_charge(p DOUBLE, d DOUBLE, t DOUBLE)
              |RETURNS DOUBLE RETURN p * (1 - d) * (1 + t)""".stripMargin)
      // (l_orderkey, l_linenumber) is NOT unique in the fixtures —
      // charge joins the sort key to make the order total (q06's fix)
      s.sql("""SELECT l_orderkey, l_linenumber,
              |  graft_charge(l_extendedprice, l_discount, l_tax) AS charge
              |FROM lineitem ORDER BY l_orderkey, l_linenumber, charge LIMIT 500""".stripMargin)
    },
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, charge LIMIT 500""".stripMargin)),

    // COUNT(DISTINCT) OVER a partition — neither engine supports it
    // directly; the dense_rank maximum is the standard rewrite and
    // runs identically on both. One shuffle on the partition key.
    QueryDef("q161_window_distinct", sqlBoth(
      """SELECT DISTINCT event_type,
        |  MAX(dr) OVER (PARTITION BY event_type) AS distinct_users
        |FROM (SELECT event_type,
        |        dense_rank() OVER (PARTITION BY event_type ORDER BY user_id) AS dr
        |      FROM events)
        |ORDER BY event_type""".stripMargin)),

    // arg-extreme aggregates: the value of one column at another
    // column's extreme (max_by/min_by, same names both engines).
    // The ordering column (o_orderkey) is unique per group, so the
    // result is total-order deterministic.
    QueryDef("q163_arg_extremes", sqlBoth(
      """SELECT o_custkey,
        |  max_by(o_orderstatus, o_orderkey) AS latest_status,
        |  min_by(o_totalprice, o_orderkey) AS first_price,
        |  max_by(o_totalprice, o_orderkey) AS latest_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // Calendar gap-fill: dense date spine LEFT JOIN sparse daily
    // aggregate, absent days coalesced to zero. Spine generation is
    // sequence+explode on Spark, generate_series+unnest on DuckDB.
    // The spine is tiny (days) and broadcast; the aggregate side is
    // one scan + one shuffle regardless of SF.
    QueryDef("q164_date_gapfill", sql(
      """WITH spine AS (
        |  SELECT explode(sequence(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS day),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
        |    CAST(SUM(CAST(FLOOR((o_totalprice) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS total
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
        |  GROUP BY 1)
        |SELECT spine.day, COALESCE(daily.n, 0) AS n, COALESCE(daily.total, 0.0) AS total
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin),
      Some("""WITH spine AS (
             |  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS day),
             |daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
             |    CAST(SUM(CAST(FLOOR((o_totalprice) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS total
             |  FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
             |  GROUP BY 1)
             |SELECT spine.day, COALESCE(daily.n, 0) AS n, COALESCE(daily.total, 0.0) AS total
             |FROM spine LEFT JOIN daily ON spine.day = daily.day
             |ORDER BY spine.day""".stripMargin)),

    // Keyset-free pagination: ORDER BY + LIMIT/OFFSET. Spark plans a
    // global top-(limit+offset) (CollectLimit with offset), never a
    // full sort — the total order over ALL output columns makes page
    // contents deterministic (lineitem has no unique key).
    QueryDef("q184_limit_offset", sqlBoth(
      """SELECT o_orderkey, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin)),

    // GROUP BY ALL / ORDER BY ALL (Spark 4 + DuckDB): grouping keys
    // inferred from the non-aggregate select list — identical text,
    // identical inference, on both engines.
    QueryDef("q185_group_by_all", sqlBoth(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(FLOOR((o_totalprice) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS total
        |FROM orders
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin)),

    // Collation-keyed grouping (Spark 4 collations): case-insensitive
    // dedup WITHOUT lowercasing the data — the grouping key is the
    // collated column itself (UTF8_LCASE ↔ DuckDB NOCASE; identical
    // equality classes over ASCII), so the engine's hash/compare
    // honors the collation while the stored spellings survive. A
    // deterministic upper-cased variant catalog is injected; output =
    // the spelling clusters (binary-min representative, spelling
    // count, row count) that an accent/case-blind entity match would
    // collapse. Collated grouping partial-aggregates like any other
    // key — no scale caveat.
    QueryDef("q245_collation_dedup",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val p = Tables.part(s, dir)
        val cat = p.filter(col("p_partkey") < 100).select(col("p_name").as("name"))
          .unionAll(p.filter(col("p_partkey") < 30)
            .select(upper(col("p_name")).as("name")))
        cat.groupBy(collate(col("name"), "UTF8_LCASE").as("k"))
          .agg(min(col("name")).as("rep"),
            countDistinct(col("name")).as("n_spellings"),
            count(lit(1)).as("n_rows"))
          .filter(col("n_spellings") > 1)
          .select(col("rep"), col("n_spellings"), col("n_rows"))
          .orderBy("rep")
      },
      Some("""SELECT MIN(name) AS rep, COUNT(DISTINCT name) AS n_spellings,
             |  COUNT(*) AS n_rows
             |FROM (
             |  SELECT p_name AS name FROM part WHERE p_partkey < 100
             |  UNION ALL
             |  SELECT upper(p_name) FROM part WHERE p_partkey < 30)
             |GROUP BY name COLLATE NOCASE
             |HAVING COUNT(DISTINCT name) > 1
             |ORDER BY rep""".stripMargin))
  )
}
