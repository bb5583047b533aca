package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers enforcing the determinism protocol (SURVEY.md §2B,
  * revised after the round-1 driver gate, re-based in round 4):
  *
  *   - Aggregation is exact and order-independent: each row's double
  *     is mapped to an exact integer-micros LONG by pure IEEE
  *     arithmetic (`FLOOR(x*1e6 + 0.5)` — identical bits on both
  *     engines), and LONG addition is exact in any order, so shuffle
  *     layout / AQE / partition count cannot change the result.
  *   - **Output columns are never DECIMAL.** Round 1 proved empirically
  *     (CORRECTNESS_r01.json) that every DECIMAL-typed output column
  *     hash-mismatches the driver's DuckDB oracle. Outputs are DOUBLE
  *     (micros/1e6 — both engines do the same two IEEE ops).
  *   - Round 4 moved the implementation from DECIMAL(38,6) sums to
  *     integer micros: same contract, but whole-stage-codegen'd long
  *     adds instead of the per-row BigDecimal slow path (q18 went
  *     3.0 s → 0.7 s at sf0.1 from this alone).
  *
  * Precision headroom: micros stay exact to ~9.2e12 dollars (int64),
  * comfortably above any per-group sum at bench scale (sf0.1 global
  * revenue ≈ 1e10, sf1000 ≈ 1e14 — re-split the measure there).
  */
object Qf {
  val D386 = "decimal(38,6)"
  val D186 = "decimal(18,6)"

  /** Order-independent exact sum, emitted as DOUBLE. Round 4: now the
    * integer-micros path ([[msum]]) — same determinism contract as the
    * decimal implementation it replaces (per-row value → exact int,
    * LONG sum exact in any order), but codegen'd. */
  def dsum(c: Column): Column = msum(c)

  /** SQL text twin of [[dsum]] for the DuckDB oracle. */
  def sqlDsum(e: String): String = sqlMsum(e)

  /** Order-independent average as DOUBLE (see object doc). */
  def davg(c: Column): Column = mavg(c)

  /** SQL text twin of [[davg]]. */
  def sqlDavg(e: String): String = sqlMavg(e)

  /** Order-independent exact sum via integer MICROS (the q74 cents
    * pattern at 6 decimals): `FLOOR(x*1e6 + 0.5)` — round-half-up for
    * the positive measures it's used on — is pure IEEE arithmetic, so
    * it is bit-identical on both engines AND stays cheap in codegen
    * (Spark's ROUND on DOUBLE allocates a BigDecimal per row; FLOOR is
    * Math.floor). The LONG sum is exact and codegen'd — ~3× faster
    * than the decimal path (q18: 3.0 s → sub-second) and exact to
    * ~9e12 dollars (sf ~1000) where DECIMAL(18,6) caps at ~1e12.
    * Emitted as DOUBLE micros/1e6; a sum past 2^53 micros rounds, but
    * identically in both engines. (NEVER `CAST(double AS BIGINT)`
    * directly: Spark truncates, DuckDB rounds — q147's trap.) */
  def msum(c: Column): Column =
    (sum(floor(c * lit(1e6) + lit(0.5))).cast("double") / lit(1e6))

  /** SQL text twin of [[msum]]. */
  def sqlMsum(e: String): String =
    s"CAST(SUM(CAST(FLOOR(($e) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6"

  /** Order-independent average on the micros path (msum / count). */
  def mavg(c: Column): Column = msum(c) / count(lit(1))

  /** SQL text twin of [[mavg]]. */
  def sqlMavg(e: String): String = s"${sqlMsum(e)} / COUNT(*)"

  /** [[msum]] with sf≥1000 headroom: per-row micros split into
    * high/low words (arithmetic shift ≫20 / mask — exact two's-
    * complement floor-split, negatives included), each word summed in
    * its own LONG. The low sum holds 2^20-bounded words for ~2^43 rows
    * per group; the high sum carries the magnitude with 2^20 of its
    * range reclaimed — together exact where a single int64 micros sum
    * wraps (Σ ≳ 9.2e12 units, e.g. sf1000 global revenue ≈ 1e14).
    * Recombination is two double converts + one FMA-free multiply-add,
    * identical IEEE ops on both engines (past 2^53 the FINAL double
    * rounds — identically — while accumulation stays exact, the same
    * caveat msum already carries). Slot this in for msum when a
    * group's micros sum can exceed int64; it costs one extra LONG of
    * agg state. */
  def msumWide(c: Column): Column = {
    val m = floor(c * lit(1e6) + lit(0.5))
    (sum(shiftright(m, 20)).cast("double") * lit(1048576.0) +
      sum(m.bitwiseAND(lit(1048575L))).cast("double")) / lit(1e6)
  }

  /** SQL text twin of [[msumWide]] (DuckDB sums BIGINT into HUGEINT —
    * never wraps — so the twin is trivially exact; the shared shape
    * keeps the recombination arithmetic bit-identical). */
  def sqlMsumWide(e: String): String =
    s"(CAST(SUM((CAST(FLOOR(($e) * 1e6 + 0.5) AS BIGINT)) >> 20) AS DOUBLE) * 1048576.0" +
      s" + CAST(SUM((CAST(FLOOR(($e) * 1e6 + 0.5) AS BIGINT)) & 1048575) AS DOUBLE)) / 1e6"
}
