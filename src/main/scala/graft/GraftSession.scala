package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession pre-configured the way the
  * engine expects — UTC session timezone (oracle parity), shuffle
  * parallelism sized to cores (not the 200 default, which at small
  * scale means mostly-empty reducers and at cluster scale should be
  * set to ~2-3× total cores), and the graft Catalyst extensions
  * (native vector functions + the dot-product rewrite rule,
  * graft.plans.GraftExtensions).
  *
  * Users who already own a session can instead set
  * `spark.sql.extensions=graft.plans.GraftExtensions` and call
  * `graft.functions.CosineSimilarity.register(spark)` /
  * `DotProduct.register(spark)`.
  */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // also applied programmatically: the conf-string path is not
      // re-read when the builder reuses an existing SparkContext
      .withExtensions(new graft.plans.GraftExtensions)
      // Cluster-scale posture (all defaults-compatible locally):
      // AQE re-plans from runtime statistics — coalesces empty post-
      // shuffle partitions and splits skewed join partitions, the two
      // failure modes a static plan hits first at 100 TB.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Runtime (MEASURED-size) broadcast ceiling. The engine's joins
      // against data-dependent relations are hint-free by policy (a
      // forced broadcast of a corpus-proportional side is a driver
      // OOM at 100 TB); the flip side is that the static 10 MiB
      // default under-broadcasts mid-size sides whose true size AQE
      // has already measured at a stage boundary. 64 MiB is a sane
      // executor/driver budget at any cluster size, applies ONLY to
      // AQE's runtime decision (the static planner threshold is
      // untouched), and at real scale the measured corpus side blows
      // past it, degrading to the shuffle join by construction.
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "67108864")
      // 128 MiB scan splits: large enough to amortize task overhead,
      // small enough that a task's working set fits executor memory.
      .config("spark.sql.files.maxPartitionBytes", "134217728")
}
