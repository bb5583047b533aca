package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryRegistry, Tables}
import Qf._

/** Q09–Q17: the join surface.
  *
  * Scale notes (100 TB): fact⋈fact joins (q09, q11, q15) shuffle on
  * their equi keys and rely on AQE for skew/strategy; genuinely small
  * dimensions (region 5 rows, nation 25 — fixed-size catalogs at ANY
  * scale factor) are broadcast explicitly so no scale-up can ever turn
  * them into a shuffle. q16's as-of join keeps an equi key (user_id) so
  * the range predicate is a residual filter on a hash/merge join, not a
  * broadcast-nested-loop.
  */
object JoinQueries extends QueryRegistry {

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q09_join_agg",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS cnt, ${sqlDsum("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    QueryDef("q10_broadcast_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = broadcast(Tables.nation(s, dir))
        val r = broadcast(Tables.region(s, dir))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, col("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name").agg(count(lit(1)).as("n_cust"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, COUNT(*) AS n_cust
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    QueryDef("q11_multiway_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = broadcast(Tables.nation(s, dir))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("cnt"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, COUNT(*) AS cnt,
              |${sqlDsum("l_extendedprice*(1-l_discount)")} AS revenue
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    QueryDef("q12_left_outer_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // RIGHT OUTER: every customer survives, orders only where the big
    // filter holds (the right-side twin of q12_left_outer_join).
    QueryDef("q12_right_outer_join",
      (s, dir) => {
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
        val c = Tables.customer(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_big_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
             |FROM (SELECT * FROM orders WHERE o_totalprice > 250000) o
             |RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    QueryDef("q12_full_outer_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
        c.join(o, c("c_custkey") === o("o_custkey"), "full")
          .agg(
            count(lit(1)).as("total"),
            count(when(col("c_custkey").isNull, 1)).as("no_cust"),
            count(when(col("o_orderkey").isNull, 1)).as("no_order"))
      },
      Some("""SELECT COUNT(*) AS total,
             |COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS no_cust,
             |COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS no_order
             |FROM customer FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
             |ON c_custkey = o_custkey""".stripMargin)),

    QueryDef("q13_semi_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q14_anti_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef("q15_range_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        li.join(o, li("l_orderkey") === o("o_orderkey") && li("l_shipdate") > o("o_orderdate"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(datediff(col("l_shipdate"), col("o_orderdate"))).cast("bigint").as("lag_days"))
      },
      Some("""SELECT COUNT(*) AS cnt,
             |CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT) AS lag_days
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate""".stripMargin)),

    // As-of join: for each purchase event, the latest click of the same
    // user at or before it. Declared via the MAX-formulation both engines
    // share; the Spark plan is an equi join on user_id with the range
    // predicate as residual + partial MAX pushed before the shuffle.
    QueryDef("q16_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
        p.join(c, col("user_id") === col("c_uid") && col("c_ts") <= col("ts"))
          .groupBy("event_id").agg(max("c_ts").as("last_click_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, MAX(CAST(c.ts AS TIMESTAMP)) AS last_click_ts
             |FROM events p JOIN events c
             |ON c.user_id = p.user_id AND c.event_type = 'click'
             |AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin)),

    QueryDef("q17_cross_join",
      (s, dir) => Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select("r_name", "n_name").orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |ORDER BY r_name, n_name""".stripMargin)),

    // Dynamic partition pruning: the fact table is laid out
    // partitioned by month; joining it to a filtered month dimension
    // must prune fact partitions AT RUNTIME from the dim's broadcast
    // result (DynamicPruningExpression in the scan — asserted in
    // PlanSpec). At 100 TB this is the difference between scanning 3
    // months and scanning all of them whenever the selective filter
    // sits on the dimension, not the fact.
    QueryDef("q156_dynamic_partition_pruning",
      (s, dir) => {
        // fixture staging is content-keyed and untimed (Fixtures doc):
        // the declared behavior is the pruned READ, not the write
        val base = Fixtures.stagedDir(dir, "orders", "q156") { tmp =>
          val o = Tables.orders(s, dir).withColumn("o_month",
            (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int"))
          o.write.mode("overwrite").partitionBy("o_month").parquet(s"$tmp/fact")
          o.select(col("o_month"), month(col("o_orderdate")).cast("int").as("moy"))
            .distinct().write.mode("overwrite").parquet(s"$tmp/dim")
        }
        val fact = s"$base/fact"
        val dim = s"$base/dim"
        s.read.parquet(fact)
          .join(s.read.parquet(dim).filter(col("moy") <= 3), "o_month")
          .groupBy(col("o_month").cast("bigint").as("o_month"))
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("o_totalprice") * 100).cast("long")).cast("bigint").as("cents"))
          .orderBy("o_month")
      },
      Some("""SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS o_month,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders WHERE month(o_orderdate) <= 3
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Co-located bucketed join: both sides written bucketBy(16) +
    // sortBy on the join key, so the sort-merge join needs NO exchange
    // and NO sort on either side — the shuffle is paid once at write
    // time and amortized over every subsequent join. At 100 TB this is
    // THE fact⋈fact strategy: bucket the big tables on their join key
    // at ingest and every downstream join/aggregation on that key is
    // exchange-free. (PlanSpec asserts the exchange-free physical
    // plan; the merge hint pins SMJ so the small local fixture can't
    // flip to broadcast and silently skip the layout under test.)
    QueryDef("q168_bucketed_join",
      (s, dir) => {
        // bucketed layout built once per fixture (untimed — the write
        // shuffle is the amortized ingest cost, the join is the query)
        Fixtures.once(s, dir, "orders", "q168_buckets") {
          graft.TableIO.writeBucketed(
            Tables.orders(s, dir), "graft_orders_bkt", "o_custkey", 16)
          graft.TableIO.writeBucketed(
            Tables.customer(s, dir), "graft_customer_bkt", "c_custkey", 16)
        }
        s.table("graft_orders_bkt").hint("merge")
          .join(s.table("graft_customer_bkt"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("o_totalprice") * 100).cast("long"))
              .cast("bigint").as("cents"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS cnt,
             |CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // SCD2 point-in-time dimension join (the warehouse staple): each
    // fact row joins the dimension version whose validity interval
    // contains the fact's date. The derived two-version customer dim
    // stands in for a real history table. Scale shape: the EQUALITY
    // key (custkey) carries the join — SMJ/broadcast like any
    // equi-join — and the validity interval is a residual filter;
    // never a range join, because with versioned dims every key has
    // few versions and the residual rejects all but one.
    QueryDef("q182_scd2_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val split = lit("1996-01-01").cast("timestamp_ntz")
        val dim = c.select(col("c_custkey"), col("c_acctbal").as("bal"),
            lit("1990-01-01").cast("timestamp_ntz").as("valid_from"),
            split.as("valid_to"), lit(1).as("ver"))
          .unionAll(c.select(col("c_custkey"), (col("c_acctbal") + 100).as("bal"),
            split.as("valid_from"),
            lit("2999-01-01").cast("timestamp_ntz").as("valid_to"), lit(2).as("ver")))
        Tables.orders(s, dir).join(dim,
            col("o_custkey") === col("c_custkey") &&
              col("o_orderdate") >= col("valid_from") &&
              col("o_orderdate") < col("valid_to"))
          .groupBy("ver")
          .agg(count(lit(1)).as("cnt"), Qf.msum(col("bal")).as("sum_bal"))
          .orderBy("ver")
      },
      Some(s"""WITH dim AS (
              |  SELECT c_custkey, c_acctbal AS bal,
              |    TIMESTAMP '1990-01-01' AS valid_from, TIMESTAMP '1996-01-01' AS valid_to, 1 AS ver
              |  FROM customer
              |  UNION ALL
              |  SELECT c_custkey, c_acctbal + 100 AS bal,
              |    TIMESTAMP '1996-01-01', TIMESTAMP '2999-01-01', 2 AS ver
              |  FROM customer)
              |SELECT ver, COUNT(*) AS cnt, ${Qf.sqlMsum("bal")} AS sum_bal
              |FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
              |  AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
              |  AND CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to
              |GROUP BY ver ORDER BY ver""".stripMargin))
  )
}
