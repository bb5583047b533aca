package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers enforcing the SURVEY.md §2B determinism protocol:
  * every floating aggregate goes through exact DECIMAL arithmetic so the
  * result is order-independent (shuffle/partition count can't change it)
  * and hash-stable vs the DuckDB oracle.
  *
  * Averages avoid engine-specific decimal-division scale rules: both
  * sides compute `double(decimal_sum) / count`, where the decimal sum is
  * capped at DECIMAL(18,6) (int64-backed ⇒ the decimal→double conversion
  * is correctly rounded and identical in both engines).
  */
object Qf {
  val D386 = "decimal(38,6)"
  val D186 = "decimal(18,6)"

  /** Exact sum: SUM(CAST(x AS DECIMAL(38,6))) typed back to (38,6). */
  def dsum(c: Column): Column = sum(c.cast(D386)).cast(D386)

  /** SQL text twin of [[dsum]] for the DuckDB oracle. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DECIMAL(38,6))"

  /** Order-independent average as DOUBLE (see object doc). */
  def davg(c: Column): Column =
    sum(c.cast(D186)).cast(D186).cast("double") / count(lit(1))

  /** SQL text twin of [[davg]]. */
  def sqlDavg(e: String): String =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) / COUNT(*)"
}
