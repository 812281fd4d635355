package graft

// Scratch stage-level profiler — NOT part of the driver contract;
// deleted before the round closes.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevProbe178 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "67108864")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // warm at sf0.001
    graft.SparkEntry.queries("q77_kmeans_train")(spark, WarmDir.of(sfDir)).count()
    graft.functions.CacheScope.drain(); graft.functions.CacheScope.drainCheckpoints(); spark.catalog.clearCache()
    import graft.operators.Similarity
    for (r <- 1 to 3) {
      val n0 = Similarity.vecs(spark, sfDir)
      val cnt = time("vecs count (parquet)")(n0.count())
      val nc = time("cache+count") {
        val c = n0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val cent = time("trainedCentroids (memo cleared)") {
        Similarity.trainedCentroids(spark, sfDir)
      }
      time("final assign+agg (cached corpus)") {
        Similarity.assignL2(nc, cent)
          .groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
          .count()
      }
      nc.unpersist(true)
      time("final assign+agg (parquet corpus)") {
        Similarity.assignL2(Similarity.vecs(spark, sfDir), cent)
          .groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
          .count()
      }
      val nc2 = Similarity.vecs(spark, sfDir).persist(); nc2.count()
      for (_ <- 1 to 3) {
        time("  one means job") {
          Similarity.assignL2(nc2, cent)
            .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
            .groupBy("cluster", "pos")
            .agg((sum(col("x").cast("decimal(28,12)")).cast("double") /
              count(lit(1))).as("m"))
            .collect()
        }
        time("  assign-only noop") {
          Similarity.assignL2(nc2, cent)
            .write.format("noop").mode("overwrite").save()
        }
        time("  means no-assign") {
          nc2.select(lit(0L).as("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
            .groupBy("cluster", "pos")
            .agg((sum(col("x").cast("decimal(28,12)")).cast("double") /
              count(lit(1))).as("m"))
            .collect()
        }
      }
      nc2.unpersist(true)
      time("q77 full")(graft.SparkEntry.queries("q77_kmeans_train")(spark, sfDir).count())
      graft.functions.CacheScope.drain(); graft.functions.CacheScope.drainCheckpoints(); spark.catalog.clearCache()
      println(s"-- round $r done (cnt=$cnt)")
    }
    spark.stop()
  }
}
