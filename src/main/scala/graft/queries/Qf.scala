package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers enforcing the determinism protocol (SURVEY.md §2B,
  * revised after the round-1 driver gate):
  *
  *   - Aggregation is exact: doubles are cast to DECIMAL(38,6) *before*
  *     SUM, so partial/final aggregation order (shuffle layout, AQE,
  *     partition count) cannot change the result.
  *   - **Output columns are never DECIMAL.** Round 1 proved empirically
  *     (CORRECTNESS_r01.json) that every DECIMAL-typed output column
  *     hash-mismatches the driver's DuckDB oracle while every
  *     decimal-*intermediate* query (q27, q78) passes. Final values are
  *     therefore funneled through DECIMAL(18,6) — int64-backed, so the
  *     decimal→double conversion is correctly rounded and identical in
  *     both engines — and emitted as DOUBLE.
  *
  * Precision headroom: DECIMAL(18,6) caps at ~1e12, comfortably above
  * any per-group sum at the bench scale factors (sf0.1 global revenue
  * ≈ 1e10). Beyond ~sf10, switch the measure to integer cents
  * (`CAST(ROUND(x*100) AS BIGINT)` summed — the q74 pattern), which
  * stays exact to ~9e16 dollars.
  */
object Qf {
  val D386 = "decimal(38,6)"
  val D186 = "decimal(18,6)"

  /** Order-independent exact sum, emitted as DOUBLE (never DECIMAL —
    * see object doc). */
  def dsum(c: Column): Column = sum(c.cast(D386)).cast(D186).cast("double")

  /** SQL text twin of [[dsum]] for the DuckDB oracle. */
  def sqlDsum(e: String): String =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(38,6))) AS DECIMAL(18,6)) AS DOUBLE)"

  /** Order-independent average as DOUBLE (see object doc). */
  def davg(c: Column): Column =
    sum(c.cast(D186)).cast(D186).cast("double") / count(lit(1))

  /** SQL text twin of [[davg]]. */
  def sqlDavg(e: String): String =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) / COUNT(*)"
}
