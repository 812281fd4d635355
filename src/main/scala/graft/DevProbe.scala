package graft

// Scratch dev profiler for hotspot queries — not part of the contract.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
    }
    // warm
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def shFlat = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(' ')
        if (t.length < 3) Iterator.empty
        else (0 to t.length - 3).iterator.map(i => (id, s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
      }.toDF("doc_id", "sh")

    // --- q22 variants ---
    time("q22 current")(operators.Dedup.q22(spark, sfDir).count())
    locally {
      val minhashes = (0 until 12).map(s =>
        min(md5(concat_ws("#", col("sh"), lit(s.toString)))).as(s"m$s"))
      val sig = shFlat.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("q22alt sig persist+count")(sig.count())
      val bandPairs = (0 until 6).map(b => s"$b, concat(m${2 * b}, m${2 * b + 1})").mkString(", ")
      val bands = sig.select(col("doc_id"),
        expr(s"stack(6, $bandPairs) AS (band_idx, band_val)"))
      val out = bands.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_a"))
        .join(bands.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_b")),
          Seq("band_idx", "band_val"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().orderBy("doc_a", "doc_b")
      time("q22alt join+distinct")(out.count())
      sig.unpersist()
    }

    locally {
      // q22 via Kirsch-Mitzenmacher double hashing: 1 md5 per shingle,
      // 12 derived hashes h1 + s*h2 (32-bit halves, no overflow)
      val withH = shFlat
        .withColumn("h", md5(col("sh")))
        .withColumn("h1", expr("CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT)"))
        .withColumn("h2", expr("CAST(conv(substring(h, 9, 8), 16, 10) AS BIGINT)"))
      val minhashes = (0 until 12).map(s => min(col("h1") + lit(s) * col("h2")).as(s"m$s"))
      val sig = withH.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("q22km sig persist+count")(sig.count())
      val bandPairs = (0 until 6).map(b => s"$b, concat_ws('_', m${2 * b}, m${2 * b + 1})").mkString(", ")
      val bands = sig.select(col("doc_id"),
        expr(s"stack(6, $bandPairs) AS (band_idx, band_val)"))
      val out = bands.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_a"))
        .join(bands.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_b")),
          Seq("band_idx", "band_val"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().orderBy("doc_a", "doc_b")
      time("q22km join+distinct")(out.count())
      sig.unpersist()
    }

    // --- q23 stages (current persisted form) ---
    time("q23 current")(operators.Dedup.q23(spark, sfDir).count())
    spark.catalog.clearCache()
    locally {
      // alt: no persist, collect_set single-pass inter, cheap second pass for sizes
      val sizes = shFlat.groupBy("doc_id").agg(countDistinct(col("sh")).as("n_sh"))
      val inter = shFlat.groupBy("sh")
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (a, i) ->
            |  transform(slice(ids, i + 2, size(ids)),
            |    b -> named_struct('doc_a', a, 'doc_b', b))))""".stripMargin)).as("p"))
        .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      val out = inter
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a")), "doc_a")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b")), "doc_b")
        .withColumn("jaccard", round(col("n_inter").cast("double") /
          (col("sh_a") + col("sh_b") - col("n_inter")), 6))
        .filter(col("jaccard") >= 0.5)
      time("q23alt collect_set no-persist")(out.count())
    }
    time("q27 current")(operators.TextAnalysis.q27(spark, sfDir).count())
    locally {
      // q23 via direct self-join on sh (DuckDB-style)
      val sizes = shFlat.groupBy("doc_id").agg(countDistinct(col("sh")).as("n_sh"))
      val shD = shFlat.distinct()
      val inter = shD.select(col("doc_id").as("doc_a"), col("sh"))
        .join(shD.select(col("doc_id").as("doc_b"), col("sh")), "sh")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_inter"))
      val out = inter
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a")), "doc_a")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b")), "doc_b")
        .withColumn("jaccard", round(col("n_inter").cast("double") /
          (col("sh_a") + col("sh_b") - col("n_inter")), 6))
        .filter(col("jaccard") >= 0.5)
      time("q23 self-join variant")(out.count())
    }
    locally {
      // q23 on hashed shingles: distinct + join on (h1, h2) longs
      val shH = shFlat
        .withColumn("h", md5(col("sh")))
        .select(col("doc_id"),
          expr("CAST(conv(substring(h, 1, 12), 16, 10) AS BIGINT)").as("h1"),
          expr("CAST(conv(substring(h, 13, 12), 16, 10) AS BIGINT)").as("h2"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      shH.count()
      val sizes = shH.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val inter = shH.select(col("doc_id").as("doc_a"), col("h1"), col("h2"))
        .join(shH.select(col("doc_id").as("doc_b"), col("h1"), col("h2")), Seq("h1", "h2"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_inter"))
      val out = inter
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a")), "doc_a")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b")), "doc_b")
        .withColumn("jaccard", round(col("n_inter").cast("double") /
          (col("sh_a") + col("sh_b") - col("n_inter")), 6))
        .filter(col("jaccard") >= 0.5)
      time("q23 hashed-key variant")(out.count())
      shH.unpersist()
    }
    spark.stop()
  }
}
