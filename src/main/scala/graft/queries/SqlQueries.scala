package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryDef, QueryRegistry, Tables}

/** Complex SQL shapes through the `spark.sql` entry path (the
  * DataFrame registries cover the fluent API; these prove the SQL
  * surface): correlated and scalar subqueries, HAVING, and TPC-H
  * Q3/Q5-style analytic joins. Where both dialects agree the same
  * text runs on Spark and DuckDB — divergence would be a correctness
  * finding, which is exactly what the oracle gate checks.
  *
  * Scale notes: correlated subqueries decorrelate into joins
  * (Catalyst's subquery rewrite); scalar subqueries become broadcast
  * single-row joins; the Q3/Q5 shapes are the canonical
  * filter-pushdown + partial-agg + top-k plans.
  */
object SqlQueries extends QueryRegistry {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q) }

  /** The exact same text runs on Spark and as the DuckDB oracle —
    * dialect divergence would surface as a correctness finding. */
  private def sqlBoth(q: String): ((SparkSession, String) => DataFrame, Option[String]) =
    (sql(q), Some(q))

  /** Order-stable average of a double column (see Qf.davg). */
  private def davgSql(e: String) =
    s"CAST(SUM(CAST(FLOOR(($e) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*)"

  /** Derived `partsupp` CTEs: the fixtures carry no partsupp table, so
    * the partsupp-dependent TPC-H shapes (Q11/Q16) run over a
    * deterministic derivation — dbgen's own modular supplier-assignment
    * scheme (4 suppliers per part, stride cnt/4 + partkey/cnt) with
    * availqty/supplycost from fixed modular arithmetic, integer-cents
    * so every aggregate is exact. Identical text runs on both engines,
    * so the derived table is bit-identical by construction. */
  private val partsuppCtes =
    """ints AS (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
      |scnt AS (SELECT COUNT(*) AS cnt, MIN(s_suppkey) AS base FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    scnt.base + (p_partkey + i.i * (CAST(FLOOR(scnt.cnt / 4.0) AS BIGINT)
      |      + CAST(FLOOR(p_partkey / CAST(scnt.cnt AS DOUBLE)) AS BIGINT))) % scnt.cnt AS ps_suppkey,
      |    (p_partkey * 7 + i.i * 131) % 9999 + 1 AS ps_availqty,
      |    (p_partkey * 31 + i.i * 47) % 100000 AS ps_supplycost_cents
      |  FROM part CROSS JOIN ints i CROSS JOIN scnt)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // correlated scalar subquery (decorrelates to a join + agg)
    QueryDef("q68_correlated_subquery", sql(
      s"""SELECT c_custkey, c_acctbal FROM customer c
         |WHERE c_acctbal > (SELECT ${davgSql("c2.c_acctbal")}
         |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
         |ORDER BY c_custkey""".stripMargin),
      Some(s"""SELECT c_custkey, c_acctbal FROM customer c
              |WHERE c_acctbal > (SELECT ${davgSql("c2.c_acctbal")}
              |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
              |ORDER BY c_custkey""".stripMargin)),

    // uncorrelated scalar subquery (single-row broadcast)
    QueryDef("q69_scalar_subquery", sql(
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE o_totalprice > 2 * (SELECT ${davgSql("o_totalprice")} FROM orders)
         |ORDER BY o_orderkey""".stripMargin),
      Some(s"""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE o_totalprice > 2 * (SELECT ${davgSql("o_totalprice")} FROM orders)
              |ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q70_having", sql(
      """SELECT o_custkey, COUNT(*) AS n FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 3 ORDER BY o_custkey""".stripMargin),
      Some("""SELECT o_custkey, COUNT(*) AS n FROM orders
             |GROUP BY o_custkey HAVING COUNT(*) >= 3 ORDER BY o_custkey""".stripMargin)),

    // TPC-H Q3 shape: segment filter → 3-way join → grouped revenue → top-k
    QueryDef("q71_tpch_q3_shape", sql(
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      Some("""SELECT o_orderkey,
             |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
             |  o_orderdate
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1999-01-01'
             |  AND l_shipdate > TIMESTAMP '1996-01-01'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape: 6-way join, region filter, revenue per nation
    QueryDef("q72_tpch_q5_shape", sql(
      """SELECT n_name,
        |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
        |  COUNT(*) AS cnt
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin),
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue,
             |  COUNT(*) AS cnt
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // TPC-H Q4 shape: EXISTS-gated per-priority counts
    QueryDef("q75_tpch_q4_shape", sql(
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders o
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q7 shape: supplier-nation × customer-nation shipping volume
    QueryDef("q76_tpch_q7_shape", sql(
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name <> cn.n_name
        |GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS INT) AS l_year,
             |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS volume
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation sn ON s_nationkey = sn.n_nationkey
             |JOIN nation cn ON c_nationkey = cn.n_nationkey
             |WHERE sn.n_name <> cn.n_name
             |GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H Q10 shape: top customers by returned-item revenue
    QueryDef("q77_tpch_q10_shape", sql(
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      Some("""SELECT c_custkey, c_name, n_name,
             |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q14 shape: promo revenue ratio (order-stable double division
    // of int64-backed decimal sums; the 1e6 micros scale cancels in the
    // ratio, so no /1e6 rescale — avoids a precedence trap)
    QueryDef("q78_tpch_q14_shape", sql(
      """SELECT
        |  CAST(SUM(CAST(FLOOR((CASE WHEN p_type = 'ECONOMY'
        |        THEN l_extendedprice*(1-l_discount) ELSE 0 END) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
        |  / CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
        |  AS promo_ratio
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin),
      Some("""SELECT
             |  CAST(SUM(CAST(FLOOR((CASE WHEN p_type = 'ECONOMY'
             |        THEN l_extendedprice*(1-l_discount) ELSE 0 END) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             |  / CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
             |  AS promo_ratio
             |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin)),

    // TPC-H Q19 shape: OR-of-ANDs predicate (pushdown + CNF stress)
    QueryDef("q79_tpch_q19_shape", sql(
      """SELECT COUNT(*) AS cnt,
        |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
        |   OR (p_type = 'SMALL' AND l_quantity < 5)""".stripMargin),
      Some("""SELECT COUNT(*) AS cnt,
             |  CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10)
             |   OR (p_type = 'SMALL' AND l_quantity < 5)""".stripMargin)),

    // explicit GROUPING SETS (beyond rollup/cube)
    QueryDef("q80_grouping_sets", sql(
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY g_status, g_priority,
         |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
             |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY g_status, g_priority,
             |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // value-based RANGE frame (vs the ROWS frames of q26/q27): a
    // 3-day trailing window over daily totals honors calendar gaps
    QueryDef("q81_range_frame", sql(
      """SELECT d,
        |  CAST(SUM(total_micro) OVER (ORDER BY d RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e6 AS trailing3d
        |FROM (
        |  SELECT CAST(datediff(o_orderdate, TIMESTAMP '1995-01-01') AS BIGINT) AS d,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS total_micro
        |  FROM orders GROUP BY 1)
        |ORDER BY d""".stripMargin),
      Some("""SELECT d,
             |  CAST(SUM(total_micro) OVER (ORDER BY d RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e6 AS trailing3d
             |FROM (
             |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
             |    CAST(SUM(CAST(FLOOR(o_totalprice * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS total_micro
             |  FROM orders GROUP BY 1)
             |ORDER BY d""".stripMargin)),

    // TPC-H Q2 shape: correlated min-cost subquery (no partsupp table
    // in the fixtures — lineitem unit price stands in for supplycost).
    // Same text both engines; the double division is bit-identical so
    // the min-equality selects the same rows.
    QueryDef("q91_tpch_q2_shape", sqlBoth(
      """SELECT DISTINCT p.p_partkey, s.s_name, n.n_name
        |FROM part p, supplier s, lineitem l, nation n, region r
        |WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
        |  AND r.r_name = 'ASIA'
        |  AND l.l_extendedprice / l.l_quantity = (
        |    SELECT MIN(l2.l_extendedprice / l2.l_quantity)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p.p_partkey AND l2.l_suppkey = s2.s_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'ASIA')
        |ORDER BY p_partkey, s_name""".stripMargin)),

    // TPC-H Q13 shape: outer join with a join-side filter, grouping on
    // the NULL-producing side (order-count distribution per customer).
    QueryDef("q92_tpch_q13_shape", sqlBoth(
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q15 shape: max-over-view (top supplier by quarterly
    // revenue); revenue through the exact-decimal → DOUBLE funnel, so
    // the MAX-equality compares identical doubles in both engines.
    QueryDef("q93_tpch_q15_shape", sqlBoth(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(FLOOR((l_extendedprice*(1-l_discount)) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin)),

    // TPC-H Q17 shape: correlated per-part average threshold.
    // l_quantity is integral-valued, so AVG is exact in any summation
    // order — the correlated threshold is engine-independent.
    QueryDef("q94_tpch_q17_shape", sqlBoth(
      """SELECT CAST(SUM(CAST(FLOOR((l_extendedprice) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 / 7.0 AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#1' AND p.p_size < 20
        |  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)),

    // TPC-H Q20 shape: nested correlated aggregate in HAVING — the
    // supplier dominating a part's 1996 shipped quantity (partsupp's
    // availqty threshold re-expressed over lineitem).
    QueryDef("q95_tpch_q20_shape", sqlBoth(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l1.l_suppkey FROM lineitem l1
        |  WHERE l1.l_shipdate >= TIMESTAMP '1996-01-01' AND l1.l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l1.l_suppkey, l1.l_partkey
        |  HAVING SUM(l1.l_quantity) > 0.5 * (
        |    SELECT SUM(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = l1.l_partkey
        |      AND l2.l_shipdate >= TIMESTAMP '1996-01-01' AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
        |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q21 shape: multi-EXISTS (EXISTS + NOT EXISTS on the same
    // relation) — suppliers who were the sole late shipper of a
    // multi-supplier finished order ("late" = shipped >60 days after
    // the order date; the fixtures carry no receipt/commit dates).
    QueryDef("q96_tpch_q21_shape", sqlBoth(
      """WITH flagged AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY AS is_late,
        |    o.o_orderstatus
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT s.s_name, COUNT(*) AS numwait
        |FROM supplier s JOIN flagged l1 ON s.s_suppkey = l1.l_suppkey
        |WHERE l1.o_orderstatus = 'F' AND l1.is_late
        |  AND EXISTS (SELECT 1 FROM flagged l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM flagged l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
        |GROUP BY s.s_name ORDER BY numwait DESC, s_name""".stripMargin)),

    // TPC-H Q6 shape: tight-range filter aggregate (the pure
    // predicate-pushdown + single-agg plan).
    QueryDef("q103_tpch_q6_shape", sqlBoth(
      """SELECT CAST(SUM(CAST(FLOOR((l_extendedprice * l_discount) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // TPC-H Q8 shape: national market share — conditional share of a
    // grouped sum (8-way join, two nation roles).
    QueryDef("q104_tpch_q8_shape", sqlBoth(
      """SELECT o_year,
        |  CAST(SUM(CAST(FLOOR((CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
        |  / CAST(SUM(CAST(FLOOR((volume) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS volume,
        |    n2.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
        |GROUP BY o_year ORDER BY o_year""".stripMargin)),

    // TPC-H Q9 shape: product-line profit per nation-year (supplycost
    // stood in by p_retailprice — no partsupp table in the fixtures).
    QueryDef("q105_tpch_q9_shape", sqlBoth(
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)
        |      - p_retailprice * l_quantity / 100) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS profit
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year""".stripMargin)),

    // TPC-H Q18 shape: large-quantity orders (HAVING subquery feeding a
    // 3-way join; quantity sums are integral → exact BIGINT).
    QueryDef("q106_tpch_q18_shape", sqlBoth(
      """SELECT c_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 350)
        |GROUP BY c_custkey, o_orderkey, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q22 shape: above-average balances with no orders (scalar
    // subquery threshold + anti join; country code from nationkey — the
    // fixtures carry no phone column).
    QueryDef("q107_tpch_q22_shape", sqlBoth(
      """SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(FLOOR((c_acctbal) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 AS totacctbal
        |FROM (
        |  SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode, c_acctbal
        |  FROM customer c
        |  WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(FLOOR((c2.c_acctbal) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*)
        |    FROM customer c2 WHERE c2.c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey))
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)),

    // TPC-H Q11 shape: value concentration over the derived partsupp —
    // grouped sum vs a same-relation scalar-subquery threshold.
    // Supplycost is integer cents, so both sums are exact BIGINTs.
    QueryDef("q110_tpch_q11_shape", sqlBoth(
      s"""WITH $partsuppCtes,
         |natps AS (
         |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
         |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11'))
         |SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
         |FROM natps
         |GROUP BY ps_partkey
         |HAVING SUM(v) > (SELECT 2.0 * SUM(v) / COUNT(DISTINCT ps_partkey) FROM natps)
         |ORDER BY value_cents DESC, ps_partkey""".stripMargin)),

    // TPC-H Q12 shape: shipmode service-level counts. The fixtures
    // carry no shipmode/commitdate/receiptdate — all three derive from
    // fixed modular arithmetic over (orderkey, linenumber), identical
    // text both engines.
    QueryDef("q111_tpch_q12_shape", sqlBoth(
      """WITH lx AS (
        |  SELECT l_orderkey, l_shipdate,
        |    CASE CAST((l_orderkey * 7 + l_linenumber * 11) % 7 AS INT)
        |      WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
        |      WHEN 3 THEN 'RAIL' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'FOB'
        |      ELSE 'REG AIR' END AS l_shipmode,
        |    l_shipdate + ((l_orderkey + l_linenumber * 3) % 30 + 1) * INTERVAL '1' DAY AS l_commitdate,
        |    l_shipdate + ((l_orderkey * 5 + l_linenumber * 7) % 45 + 1) * INTERVAL '1' DAY AS l_receiptdate
        |  FROM lineitem)
        |SELECT l_shipmode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lx ON o_orderkey = l_orderkey
        |WHERE l_shipmode IN ('MAIL', 'SHIP')
        |  AND l_commitdate < l_receiptdate
        |  AND l_shipdate < l_commitdate
        |  AND l_receiptdate >= TIMESTAMP '1996-01-01' AND l_receiptdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_shipmode ORDER BY l_shipmode""".stripMargin)),

    // TPC-H Q16 shape: supplier counts per part attribute over the
    // derived partsupp, excluding flagged suppliers via NOT IN (the
    // fixtures carry no s_comment — negative balance stands in).
    QueryDef("q112_tpch_q16_shape", sqlBoth(
      s"""WITH $partsuppCtes
         |SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'MEDIUM%'
         |  AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // Bitwise aggregates (same names and BIGINT semantics both engines)
    QueryDef("q129_bit_aggs", sqlBoth(
      """SELECT event_type,
        |  CAST(BIT_AND(event_id) AS BIGINT) AS band,
        |  CAST(BIT_OR(event_id) AS BIGINT) AS bor,
        |  CAST(BIT_XOR(event_id) AS BIGINT) AS bxor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Conditional/comparison scalar surface: NULLIF/COALESCE/IFNULL/
    // GREATEST/LEAST (identical text both engines; doubles compare
    // bit-identically)
    QueryDef("q130_conditional_funcs", sqlBoth(
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  IFNULL(NULLIF(o_orderpriority, '1-URGENT'), 'urgent') AS prio_or_urgent,
        |  GREATEST(o_totalprice, 100000.0) AS price_floor,
        |  LEAST(o_totalprice, 200000.0) AS price_cap
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    // EXISTS inside a disjunction (decorrelation stress)
    QueryDef("q73_exists_or", sql(
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c.c_custkey AND o_totalprice > 400000)
        |   OR c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c.c_custkey AND o_totalprice > 400000)
             |   OR c_acctbal > 9000
             |ORDER BY c_custkey""".stripMargin)),

    // Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep duplicate
    // multiplicity (q31 covers the DISTINCT variants) — identical text
    // both engines, canonical multiplicities re-counted in the output
    QueryDef("q143_except_all", sqlBoth(
      """SELECT l_suppkey, COUNT(*) AS multiplicity FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity >= 10
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),
    QueryDef("q143_intersect_all", sqlBoth(
      """SELECT l_suppkey, COUNT(*) AS multiplicity FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity >= 10
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // LATERAL correlated derived table: top-2 orders per high-balance
    // customer — the decorrelation path ORDER BY + LIMIT inside a
    // correlated subquery exercises (Catalyst plans a per-key group
    // limit, not an all-orders sort)
    QueryDef("q144_lateral_topk", sqlBoth(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |           WHERE o_custkey = c.c_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_acctbal > 9900
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)),

    // Error-safe casting surface: TRY_CAST returns NULL instead of
    // failing on malformed input (identical semantics both engines) —
    // the ingestion posture for dirty columns at scale, where one bad
    // row must not kill a 100 TB job
    QueryDef("q147_try_cast", sqlBoth(
      """SELECT o_orderkey,
        |  TRY_CAST(o_orderstatus AS INTEGER) AS status_int,
        |  TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
        |  TRY_CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    // Recursive CTE (Spark 4 WITH RECURSIVE): transitive closure over a
    // derived containment chain — identical text both engines; the
    // recursion is driver-bounded by the anchor's fan-out, not a
    // hand-rolled loop
    QueryDef("q149_recursive_cte", sqlBoth(
      """WITH RECURSIVE chain(orderkey, depth) AS (
        |  SELECT o_orderkey, 0 FROM orders WHERE o_orderkey >= 1 AND o_orderkey < 10
        |  UNION ALL
        |  SELECT orderkey * 2, depth + 1 FROM chain WHERE orderkey * 2 <= 1000
        |)
        |SELECT orderkey, MAX(depth) AS max_depth FROM chain
        |GROUP BY orderkey ORDER BY orderkey""".stripMargin)),

    // Histogram binning via portable floor arithmetic (DuckDB lacks
    // width_bucket): equi-width price buckets with per-bucket mass
    QueryDef("q150_histogram", sqlBoth(
      """SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bucket,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(l_quantity) AS BIGINT) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Null-safe equality join: <=> (Spark) vs IS NOT DISTINCT FROM
    // (DuckDB) — NULL keys MATCH each other, unlike '=' which drops
    // them. Derived nullable keys make the NULL-match arm non-empty.
    QueryDef("q145_nullsafe_join", sql(
      """WITH a AS (SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |                       ELSE o_orderkey % 100 END AS k,
        |                  o_orderkey FROM orders WHERE o_orderkey < 300),
        |b AS (SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |                  ELSE o_orderkey % 100 END AS k,
        |             o_orderkey AS rhs_key FROM orders WHERE o_orderkey < 300)
        |SELECT a.k, COUNT(*) AS matches,
        |  CAST(SUM(a.o_orderkey + b.rhs_key) AS BIGINT) AS key_sum
        |FROM a JOIN b ON a.k <=> b.k
        |GROUP BY a.k ORDER BY a.k NULLS FIRST""".stripMargin),
      Some("""WITH a AS (SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
             |                       ELSE o_orderkey % 100 END AS k,
             |                  o_orderkey FROM orders WHERE o_orderkey < 300),
             |b AS (SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
             |                  ELSE o_orderkey % 100 END AS k,
             |             o_orderkey AS rhs_key FROM orders WHERE o_orderkey < 300)
             |SELECT a.k, COUNT(*) AS matches,
             |  CAST(SUM(a.o_orderkey + b.rhs_key) AS BIGINT) AS key_sum
             |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
             |GROUP BY a.k ORDER BY a.k NULLS FIRST""".stripMargin))
  )
}
