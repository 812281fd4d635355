package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling. q41 handles AGGREGATION skew with manual
  * salting (AQE cannot re-key an aggregate); for JOIN skew the engine
  * position is the opposite — rely on AQE's skew-join split rather
  * than hand-salting every join. This spec proves that safety net
  * actually fires: a join with one hot key, sized past the skew
  * thresholds, must show a `skew=true` sort-merge join in the final
  * adaptive plan and still produce exact results. At 100 TB this is
  * the difference between "one straggler task owns the hot key's
  * entire partition" and N parallel splits of it.
  */
class SkewSpec extends AnyFunSuite {

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    // Own session (shared context, isolated SQLConf): skew thresholds
    // lowered so test-sized data crosses them; broadcast disabled so
    // the join actually sort-merges.
    val s: SparkSession = SparkTestSession.get.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    // 100k rows on ONE key + a uniform tail vs a small dimension side.
    val hot = s.range(100000L).select(lit(0L).as("k"),
        concat(lit("payload-"), col("id")).as("v"))
      .union(s.range(4000L).select((col("id") % 97 + 1).as("k"),
        concat(lit("tail-"), col("id")).as("v")))
    val dim = s.range(98L).select(col("id").as("k"),
      concat(lit("dim-"), col("id")).as("d"))

    // execute THIS Dataset's own QueryExecution (count() would plan a
    // separate aggregate and leave `joined`'s adaptive plan unfinalized)
    val joined = hot.join(dim, "k")
    val it = joined.toLocalIterator()
    var rows = 0L
    while (it.hasNext) { it.next(); rows += 1 }
    assert(rows === 104000L, "join result wrong under skew handling")

    // the FINAL adaptive plan (post-execution) must mark the skew split
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n$finalPlan")
  }
}
