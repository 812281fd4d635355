package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (the `Aggregator[IN, BUF, OUT]` tier of the
  * build plan, SURVEY.md §2.6 "UDAF surface"): geometric mean via
  * log-sum — numerically stable (a direct product overflows doubles
  * after ~300 values) and mergeable: the buffer is (Σ ln x, n), so
  * partial aggregation runs map-side and the shuffle carries 16 bytes
  * per group per partition, the same scale shape as built-in avg.
  *
  * Oracle parity: exp(avg(ln x)) is expressible in any SQL engine;
  * summation-order differences across partitions perturb the result
  * only at the last few ulps, far below the round(…, 4) the queries
  * compare at.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column-API entry point for untyped DataFrames. */
  def geo_mean(c: Column): Column = udaf(GeoMean).apply(c)
}
