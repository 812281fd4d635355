package graft.functions

/** Closed-form ordinary-least-squares / correlation algebra over raw
  * power sums — the shared home of the slope, R², and Pearson
  * formula strings, shared verbatim (same string → same bits)
  * between the Spark `expr` path and each DuckDB oracle, and between
  * the queries that fit lines from mergeable moments (q88 moment
  * stats, q89 price-on-quantity per brand, q125 Zipf log-log
  * spectrum per source). Derived pieces that are query-local algebra
  * over these (q89's intercept, its corr²-form R²) stay at the call
  * site.
  *
  * All arguments are column/alias NAMES in the CANONICAL MOMENT
  * ORDER (n, sx, sx2, sy, sy2, sxy), with each helper simply
  * omitting the moments it doesn't use — keep call sites in that
  * order, because every parameter is a String and a transposed call
  * compiles silently into plausible-but-wrong SQL on BOTH engines at
  * once (the cross-engine hash cannot catch a shared wrong formula).
  * The caller owns getting the moments themselves bit-identical
  * across engines (DECIMAL sums of floorRound-ed leaves — the
  * q88/q114 discipline). The formulas run in DOUBLE, where products
  * and quotients of bit-identical inputs are correctly-rounded IEEE
  * on every engine.
  *
  * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) — the textbook normal-
  * equation solution, "distributed linear regression without
  * gradient descent".
  *
  * The guarded variants exist for fits over DERIVED relations whose
  * cardinality can legitimately collapse to one point (e.g. a
  * frequency spectrum of a source whose types all share one
  * frequency). The guard is `n <= 1` — an EXACT comparison on an
  * integer-valued count — NOT `denX = 0`: for a single point at
  * x ≠ 0, nd·Σx² − (Σx)² is algebraically zero but numerically a
  * double→DECIMAL(12-place) rounding residual (~1e-13), so an
  * exact-zero test misses and the ratio amplifies rounding noise
  * into an arbitrary slope and an R² outside [0,1]. With n ≥ 2 the
  * x-values are distinct by construction in every caller (distinct
  * frequencies / distinct regressor values), so denX is a genuinely
  * O(Δx²)-sized positive quantity and the residual (≤ n²·1e-12)
  * cannot cancel it.
  *
  * denY has no such structural floor: a spectrum whose y-values are
  * all bit-equal still yields a nonzero denY, because Σy² sums the
  * 12-place ROUNDINGS of y² — the residual n²·(round(y²) − y²) can
  * land either side of zero, so neither an exact-zero test nor a
  * sign assumption holds. R² therefore gets a range clamp on top of
  * the guard: simple-OLS R² is mathematically num²/(denX·denY) ∈
  * [0,1], so least/greatest with INTEGER literals (the round-5
  * decimal-literal rule) pins residual-noise ratios to the valid
  * range while leaving every non-degenerate value untouched — and
  * both engines clamp the same bit-identical double, so the result
  * stays deterministic. */
object Ols {
  /** (nΣxy − ΣxΣy) — shared numerator of slope and R². */
  def num(n: String, sx: String, sy: String, sxy: String): String =
    s"($n * $sxy - $sx * $sy)"

  /** (nΣx² − (Σx)²) — x-variance denominator. */
  def denX(n: String, sx: String, sx2: String): String =
    s"($n * $sx2 - $sx * $sx)"

  /** (nΣy² − (Σy)²) — y-variance term of R². */
  def denY(n: String, sy: String, sy2: String): String =
    s"($n * $sy2 - $sy * $sy)"

  /** Pearson correlation from bivariate raw moments — the
    * covariance/std form (q88's corr, squared by q89 for its R²;
    * distinct from [[r2Guarded]]'s num²/(denX·denY) form, which
    * avoids sqrt for the guard algebra). */
  def corr(n: String, sx: String, sx2: String,
           sy: String, sy2: String, sxy: String): String =
    s"($sxy - $sx * $sy / $n) / " +
      s"(sqrt($sx2 - $sx * $sx / $n) * sqrt($sy2 - $sy * $sy / $n))"

  /** Unguarded slope — for fits whose regressor provably varies
    * within every group (q89: l_quantity spans 1..50 per brand). */
  def slope(n: String, sx: String, sx2: String, sy: String,
            sxy: String): String =
    s"${num(n, sx, sy, sxy)} / ${denX(n, sx, sx2)}"

  /** Degenerate-guarded slope: 0 when the fit has fewer than two
    * points (see object doc for why the guard is on n, not denX). */
  def slopeGuarded(n: String, sx: String, sx2: String, sy: String,
                   sxy: String): String =
    s"CASE WHEN $n <= 1 OR ${denX(n, sx, sx2)} = 0 THEN 0 " +
      s"ELSE ${slope(n, sx, sx2, sy, sxy)} END"

  /** Degenerate-guarded, range-clamped R² = num² / (denX·denY): 0 on
    * <2 points or an exact-zero denominator, and clamped into the
    * mathematical [0,1] range so near-degenerate rounding-residual
    * ratios (see object doc) stay valid proportions-of-variance. */
  def r2Guarded(n: String, sx: String, sx2: String, sy: String,
                sy2: String, sxy: String): String = {
    val nm = num(n, sx, sy, sxy)
    val dx = denX(n, sx, sx2)
    val dy = denY(n, sy, sy2)
    s"least(greatest(CASE WHEN $n <= 1 OR $dx * $dy = 0 THEN 0 " +
      s"ELSE ($nm * $nm) / ($dx * $dy) END, 0), 1)"
  }
}
