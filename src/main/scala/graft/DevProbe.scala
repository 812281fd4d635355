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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs.count")(docs.count())
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val sh = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("sh"))
    time("shingles.count")(sh.count())
    time("shingles md5x1 agg")(
      sh.groupBy("doc_id").agg(min(md5(col("sh")))).count())
    val minhashes = (0 until 12).map(s =>
      min(md5(concat_ws("#", col("sh"), lit(s.toString)))).as(s"m$s"))
    val sig = sh.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*)
    time("sig (12 md5 mins)")(sig.count())
    val bandPairs = (0 until 6).map(b => s"$b, concat(m${2*b}, m${2*b+1})").mkString(", ")
    val bands = sig.select(col("doc_id"), expr(s"stack(6, $bandPairs) AS (band_idx, band_val)"))
    time("bands")(bands.count())
    time("full q22")(operators.Dedup.q22(spark, sfDir).count())
    time("full q22 again")(operators.Dedup.q22(spark, sfDir).count())
    spark.stop()
  }
}
