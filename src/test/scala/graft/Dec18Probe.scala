package graft

/** Dev-only stdin→stdout bridge for `dev/check.py --dec18-probe` (r10
  * advice): the probe property-tests DuckDB's
  * `CAST(x AS DECIMAL(38,18))` against the exact driver/Spark recipe
  * `BigDecimal.valueOf(x).setScale(18, HALF_UP)` over adversarial
  * doubles. Replicating `BigDecimal.valueOf` (= `Double.toString`
  * semantics) in Python is exactly the 1-ulp-desync trap OracleRound
  * warns about, so check.py ships the doubles here as raw bit
  * patterns and reads back the authoritative plain-string decimals.
  *
  * Protocol: one 16-hex-digit IEEE-754 bit pattern per stdin line →
  * one `toPlainString` of [[graft.operators.Similarity.dec18]] per
  * stdout line.
  */
object Dec18Probe {
  def main(args: Array[String]): Unit = {
    val out = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(System.out)))
    scala.io.Source.stdin.getLines().filter(_.nonEmpty).foreach { line =>
      val d = java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(line.trim, 16))
      out.println(graft.operators.Similarity.dec18(d).toPlainString)
    }
    out.flush()
  }
}
