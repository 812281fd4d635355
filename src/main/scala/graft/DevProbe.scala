package graft

// Scratch dev profiler for hotspot queries — not part of the contract.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val warmDir = WarmDir.of(sfDir)
    try operators.Dedup.q23(spark, warmDir).count() catch {
      case t: Throwable => System.err.println(s"[probe] warm-up failed: $t")
    }
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def shFlat = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(' ')
        if (t.length < 3) Iterator.empty
        else (0 to t.length - 3).iterator.map(i => (id, s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
      }.toDF("doc_id", "sh")

    def shHashed = shFlat
      .withColumn("h", md5(col("sh")))
      .select(col("doc_id"),
        expr("CAST(conv(substring(h, 1, 12), 16, 10) AS BIGINT)").as("h1"),
        expr("CAST(conv(substring(h, 13, 12), 16, 10) AS BIGINT)").as("h2"))

    def jaccardTail(sh: org.apache.spark.sql.DataFrame): Long = {
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val inter = sh.select(col("doc_id").as("doc_a"), col("h1"), col("h2"))
        .join(sh.select(col("doc_id").as("doc_b"), col("h1"), col("h2")), Seq("h1", "h2"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a")), "doc_a")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b")), "doc_b")
        .withColumn("jaccard", col("n_inter").cast("double") /
          (col("sh_a") + col("sh_b") - col("n_inter")))
        .filter(col("jaccard") >= 0.5)
        .count()
    }

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("q23 registered (current)") {
        operators.Dedup.q23(spark, sfDir).count()
      }
      spark.catalog.clearCache()

      locally { // stage breakdown: distinct+persist, then tail, NO df filter
        val hashed = shHashed.distinct().persist(StorageLevel.MEMORY_AND_DISK)
        time("  stage distinct+persist+count")(hashed.count())
        time("  stage join-tail no-df-filter")(jaccardTail(hashed))
        hashed.unpersist(true)
      }

      locally { // df filter BEFORE distinct-persist: filter inside the same agg pass
        // df over distinct (doc,sh) == count per key after distinct;
        // do distinct+df in ONE aggregation on (h1,h2): collect doc
        // list sizes — here approximated by groupBy sh agg count +
        // semi-join back (what the registered q23 does now).
        val hashed = shHashed.distinct().persist(StorageLevel.MEMORY_AND_DISK)
        time("  v2 distinct+persist+count")(hashed.count())
        val keep = hashed.groupBy("h1", "h2").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20).select("h1", "h2")
        val filtered = hashed.join(broadcast(keep), Seq("h1", "h2"), "left_semi")
        time("  v2 semijoin+tail")(jaccardTail(filtered))
        hashed.unpersist(true)
      }

      locally { // v4: semi-join WITHOUT broadcast — shuffle on (h1,h2) reusable by the self-join
        val hashed = shHashed.distinct().persist(StorageLevel.MEMORY_AND_DISK)
        time("  v4 distinct+persist+count")(hashed.count())
        val keep = hashed.groupBy("h1", "h2").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20).select("h1", "h2")
        val filtered = hashed.join(keep, Seq("h1", "h2"), "left_semi")
        time("  v4 shuffle-semijoin+tail")(jaccardTail(filtered))
        hashed.unpersist(true)
      }

      locally { // v5: df filter fused into the pair join via HAVING on the bucket
        // group the persisted table by (h1,h2) once, filter df<=20,
        // expand each bucket's sorted doc list into pairs inline
        val hashed = shHashed.distinct().persist(StorageLevel.MEMORY_AND_DISK)
        time("  v5 distinct+persist+count")(hashed.count())
        val sizesAll = hashed.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val buckets = hashed.groupBy("h1", "h2")
          .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
          .filter(size(col("ids")) <= 20)
        val inter = buckets
          .select(explode(expr(
            """flatten(transform(ids, (a, i) ->
              |  transform(slice(ids, i + 2, size(ids)),
              |    b -> named_struct('doc_a', a, 'doc_b', b))))""".stripMargin)).as("p"))
          .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
          .agg(count(lit(1)).as("n_inter"))
        // sizes must also be df-filtered for union consistency: recompute from exploded buckets
        val sizes = buckets.select(explode(col("ids")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val out = inter
          .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a")), "doc_a")
          .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b")), "doc_b")
          .withColumn("jaccard", col("n_inter").cast("double") /
            (col("sh_a") + col("sh_b") - col("n_inter")))
          .filter(col("jaccard") >= 0.5)
        time("  v5 bucket-expand tail")(out.count())
        val _ = sizesAll
        hashed.unpersist(true)
      }

      locally { // v3: persist the FILTERED set instead (2 shuffles before cache)
        val hashed = shHashed.distinct()
        val keep = hashed.groupBy("h1", "h2").agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20).select("h1", "h2")
        val filtered = hashed.join(broadcast(keep), Seq("h1", "h2"), "left_semi")
          .persist(StorageLevel.MEMORY_AND_DISK)
        time("  v3 filtered persist+count")(filtered.count())
        time("  v3 tail")(jaccardTail(filtered))
        filtered.unpersist(true)
      }
    }
    spark.stop()
  }
}
