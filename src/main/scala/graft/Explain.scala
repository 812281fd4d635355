// Dev tool: print the formatted physical plan of one registered query.
// Usage: scala -cp ... graft.devtools... — compiled into test? Simpler:
// run via: java -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Explain q05_region_revenue [sfDir]
package graft

import org.apache.spark.sql.SparkSession

object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
