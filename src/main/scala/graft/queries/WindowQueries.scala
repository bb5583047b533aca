package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, QueryRegistry, Tables}
import Qf._

/** Q24–Q28: window functions.
  *
  * Every window here is partitioned by a real key (custkey / user_id),
  * so at scale each partition's state fits one task. The only
  * unpartitioned windows (q27 moving average, q28 quartiles) run over
  * post-aggregation cardinality (days, customers) — documented
  * single-partition sorts over small inputs, not row-scale sorts.
  * Orderings always include a unique tiebreak column so rank/lag
  * assignment is deterministic (and identical to the oracle).
  */
object WindowQueries extends QueryRegistry {

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q24_ranking",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    QueryDef("q25_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta"),
            (lead(col("value"), 1).over(w) - col("value")).as("next_delta"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |value - LAG(value) OVER w AS delta,
             |LEAD(value) OVER w - value AS next_delta
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
             |ORDER BY event_id""".stripMargin)),

    QueryDef("q26_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .select(col("event_id"),
            // exact decimal running sum, emitted as DOUBLE (DECIMAL
            // outputs are banned — round-1 gate lesson)
            sum(col("value").cast(D386)).over(w).cast(D186).cast("double").as("running"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             |  PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,6)) AS DOUBLE) AS running
             |FROM events ORDER BY event_id""".stripMargin)),

    QueryDef("q27_moving_avg",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz").as("d"))
          .agg(dsum(col("o_totalprice")).as("total"))
        val w = Window.orderBy("d").rowsBetween(-1, 1)
        daily.select(col("d"),
            (sum(col("total")).over(w).cast(D186).cast("double") /
              count(lit(1)).over(w)).as("mov_avg"))
          .orderBy("d")
      },
      Some("""SELECT d,
             |CAST(CAST(SUM(total) OVER w AS DECIMAL(18,6)) AS DOUBLE) / COUNT(*) OVER w AS mov_avg
             |FROM (
             |  SELECT date_trunc('day', o_orderdate) AS d,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS total
             |  FROM orders GROUP BY 1)
             |WINDOW w AS (ORDER BY d ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
             |ORDER BY d""".stripMargin)),

    QueryDef("q84_window_nav",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir)
          .select(col("event_id"),
            first(col("value")).over(w).as("first_v"),
            last(col("value")).over(w).as("last_v"),
            nth_value(col("value"), 2).over(w).as("second_v"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  first_value(value) OVER w AS first_v,
             |  last_value(value) OVER w AS last_v,
             |  nth_value(value, 2) OVER w AS second_v
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY event_id""".stripMargin)),

    QueryDef("q28_ntile",
      (s, dir) => {
        val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
        Tables.customer(s, dir)
          .select(col("c_custkey"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |NTILE(4) OVER w AS quartile,
             |PERCENT_RANK() OVER w AS pr,
             |CUME_DIST() OVER w AS cd
             |FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
             |ORDER BY c_custkey""".stripMargin))
  )
}
