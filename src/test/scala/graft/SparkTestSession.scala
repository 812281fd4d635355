package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (guide: one
  * SparkSession per suite; sharing across suites is safe because the
  * config is identical). `local[4,2]` (not plain `local[4]`) enables
  * task retry (maxFailures = 2) like a real cluster (default 4) —
  * required by PipelineSpec's fault-injection test and harmless
  * elsewhere: a genuinely failing task still fails the job on its
  * second attempt. */
object SparkTestSession {
  lazy val get: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
