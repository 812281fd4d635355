package graft

// Scratch dev profiler — time named SparkEntry queries in a Bench-like
// session (same master/shuffle conf/warm-up discipline) without paying
// for the whole suite. Not part of the driver contract.
//   usage: graft.DevProbe <sfDir> <queryName>...   (repeats each twice)
import org.apache.spark.sql.SparkSession

object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.tail.toSeq else Seq("q62_dedup_clusters")
    // Validate names BEFORE paying for session startup — a typo should
    // cost a usage line, not a Spark boot + NoSuchElementException.
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown quer${if (unknown.size == 1) "y" else "ies"}: ${unknown.mkString(", ")}")
      System.err.println("valid names:\n  " + SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // bench parity: runtime measured-size broadcast ceiling
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "67108864")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val warmDir = WarmDir.of(sfDir)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try fn(spark, warmDir).count() catch {
        case t: Throwable => System.err.println(s"[probe] warm-up failed for $n: $t")
      }
      graft.functions.CacheScope.drain(); graft.functions.CacheScope.drainCheckpoints(); spark.catalog.clearCache()
      // Bench parity: drain per run, NO blanket clearCache — family-
      // lifetime index memos survive between queries there too. After
      // the clearCache above, r1 shows the index BUILD cost (self-heal
      // rebuild) and r2 the steady-state SERVE cost.
      for (round <- 1 to 2) {
        time(s"$n r$round")(fn(spark, sfDir).count())
        graft.functions.CacheScope.drain()
        graft.functions.CacheScope.drainCheckpoints()
      }
    }
    spark.stop()
  }
}
