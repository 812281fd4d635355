package graft

// Scratch dev profiler for hotspot queries — not part of the contract.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
    }
    // warm
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val shRaw = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("sh"))
    time("shRaw.count")(shRaw.count())
    import spark.implicits._
    val shFlat = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(' ')
        if (t.length < 3) Iterator.empty
        else (0 to t.length - 3).iterator.map(i => (id, s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
      }.toDF("doc_id", "sh")
    time("shFlat.count")(shFlat.count())
    time("shFlat.count2")(shFlat.count())
    time("shFlat.distinct")(shFlat.distinct().count())
    time("shRaw.distinct")(shRaw.distinct().count())
    val minhashes = (0 until 12).map(s =>
      min(md5(concat_ws("#", col("sh"), lit(s.toString)))).as(s"m$s"))
    time("12-md5 minhash agg")(shRaw.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*).count())
    time("collectset by sh")(
      shRaw.groupBy("sh").agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1).count())
    time("q22 full")(operators.Dedup.q22(spark, sfDir).count())
    time("q23 full")(operators.Dedup.q23(spark, sfDir).count())
    time("q27 full")(operators.TextAnalysis.q27(spark, sfDir).count())
    time("q37 full")(operators.Similarity.q37(spark, sfDir).count())
    time("q37 again")(operators.Similarity.q37(spark, sfDir).count())
    spark.stop()
  }
}
