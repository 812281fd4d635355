package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, sum}

/** Cross-engine-deterministic rounding and summation.
  *
  * Two failure modes were observed (at sf0.1) when hash-comparing
  * doubles against the DuckDB oracle:
  *
  *  1. `round(x, k)` algorithm mismatch: Spark routes through Java's
  *     `BigDecimal.valueOf` (the double's SHORTEST decimal string),
  *     DuckDB rounds the exact binary value — they disagree precisely
  *     when the shortest representation ends in 5·10^-(k+1).
  *     `floorRound` = floor(x·10^k + 0.5)/10^k is plain IEEE
  *     arithmetic, identical on any engine given bit-identical x.
  *     (Ties round toward +∞, not away from zero — fine for the
  *     non-negative measures used here; both engines agree either way.)
  *
  *  2. double-sum order dependence: partial (map-side) aggregation
  *     adds in a different order than the oracle's sequential scan, so
  *     the sums differ in the last ulps and can straddle a rounding
  *     boundary. `exactSum` casts to DECIMAL(18,6) first — decimal
  *     addition is associative, so any aggregation tree yields the
  *     same value — then returns double for presentation.
  *
  * At 100 TB: decimal aggregation costs ~10-20% over double on the
  * scan but removes result nondeterminism across retries/plan changes
  * — worth it anywhere results feed comparisons or dedup keys.
  */
object OracleRound {
  // Exact by construction (each product ≤ 1e12 < 2^53 is an exact
  // double), not math.pow: libm pow is only 1-ulp-accurate by spec,
  // and floorRoundSql prints pow10(k).toLong into the oracle text —
  // a 1-ulp-low power would silently truncate and desynchronize the
  // two engines' rounding constants.
  private val pow10: Array[Double] = Array.iterate(1.0, 13)(_ * 10.0)

  /** floor(x·10^k + 0.5)/10^k — deterministic cross-engine rounding. */
  def floorRound(c: Column, k: Int): Column =
    floor(c * pow10(k) + 0.5) / pow10(k)

  /** The same rounding on a plain double, for driver-side algebra
    * that must match [[floorRoundSql]] output (q171's collected-
    * moment path). Uses the SAME exact [[pow10]] table — never
    * libm pow, per the header note. */
  def floorRoundDouble(x: Double, k: Int): Double =
    math.floor(x * pow10(k) + 0.5) / pow10(k)

  /** Order-independent sum of a double column via DECIMAL(18,6). */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** The SQL-text twin of [[floorRound]] for the DuckDB oracle. */
  def floorRoundSql(expr: String, k: Int): String =
    s"floor(($expr) * ${pow10(k).toLong} + 0.5) / ${pow10(k).toLong}"

  /** The SQL-text twin of [[exactSum]]. */
  def exactSumSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"
}
