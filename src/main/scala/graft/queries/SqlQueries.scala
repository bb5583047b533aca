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

  /** Order-stable average of a double column (see Qf.davg). */
  private def davgSql(e: String) =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DECIMAL(18,6)) AS DOUBLE) / COUNT(*)"

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
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      Some("""SELECT o_orderkey,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS revenue,
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
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS revenue,
        |  COUNT(*) AS cnt
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin),
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS revenue,
             |  COUNT(*) AS cnt
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

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
             |ORDER BY c_custkey""".stripMargin))
  )
}
