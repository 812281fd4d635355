package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the cross-engine integer-division discipline (r9 review):
  * Spark's `DIV` truncates toward zero, and — measured against the
  * DuckDB 1.0.0 the oracle runs — DuckDB's `//` TRUNCATES TOO
  * ((-101)//50 = -2 there, not the floored -3). Bucketing exprs that
  * must FLOOR (q165's length band, the q153/q155 day bucket)
  * therefore use the explicit largest-multiple form on BOTH engines:
  * `(x - pmod(x, d)) DIV d` in Spark, `(x - ((x % d + d) % d)) // d`
  * in the oracle. The numerator is an exact multiple of d, so the
  * final division is exact under truncation OR floor semantics —
  * this spec proves the Spark side ≡ Math.floorDiv across the sign
  * grid (the oracle side is exact-by-construction for the same
  * reason and was verified by hand against duckdb 1.0.0). */
class DivisionParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("the largest-multiple DIV form floors for every sign combination; bare DIV truncates") {
    import spark.implicits._
    val cases = Seq(-101L, -100L, -50L, -49L, -1L, 0L, 1L, 49L, 50L, 101L,
      -86400000000001L, 86400000000001L) // ±(1 day of ns + 1) — the q153 magnitude
    for (d <- Seq(50L, 86400000000000L)) {
      val rows = cases.toDF("x")
        .selectExpr("x", s"(x - pmod(x, ${d}L)) DIV ${d}L AS floored",
          s"x DIV ${d}L AS truncated")
        .collect()
      rows.foreach { r =>
        val x = r.getLong(0)
        assert(r.getLong(1) === Math.floorDiv(x, d),
          s"largest-multiple form is not floor for x=$x d=$d")
        assert(r.getLong(2) === x / d,
          s"bare DIV is not truncation for x=$x d=$d")
      }
    }
  }

  test("pmod is non-negative for negative inputs (the premise of the largest-multiple form)") {
    import spark.implicits._
    val vals = Seq(-101L, -50L, -1L, 0L, 1L, 101L).toDF("x")
      .selectExpr("x", "pmod(x, 50L) AS p").collect()
    vals.foreach { r =>
      val (x, p) = (r.getLong(0), r.getLong(1))
      assert(p >= 0 && p < 50, s"pmod($x, 50) = $p out of [0, 50)")
      assert((x - p) % 50 === 0, s"x - pmod not a multiple for x=$x")
    }
  }
}
