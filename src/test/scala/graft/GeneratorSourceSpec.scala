package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 generator (blow's `Generator` as a real Spark
  * source): correct contents, requested partitioning, and the
  * fizzbuzz pipeline running on top of it end-to-end. */
class GeneratorSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def gen(n: Long, parts: Int) =
    spark.read.format("graft.sources.GeneratorSource")
      .option("n", n).option("partitions", parts).load()

  test("emits exactly [0, n) with the requested partition count") {
    val df = gen(10000, 8)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 10000)
    val agg = df.agg(min("val"), max("val"), countDistinct("val")).collect()(0)
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) === (0L, 9999L, 10000L))
  }

  test("partition boundaries cover n not divisible by partitions") {
    val df = gen(1003, 4)
    assert(df.count() === 1003)
    assert(df.agg(sum("val")).collect()(0).getLong(0) === 1003L * 1002 / 2)
  }

  test("MICRO_BATCH_READ: streaming the generator ≡ the batch range, exactly once") {
    // The reference's Generator may emit forever (maps/maps.go:44-47);
    // the micro-batch capability is its unbounded twin. Stream n=500
    // in 100-value triggers into a memory sink and require the result
    // to equal the batch projection — every value once, none lost.
    val q = spark.readStream.format("graft.sources.GeneratorSource")
      .option("n", 500).option("partitions", 3).option("rowsPerBatch", 100)
      .load()
      .writeStream.format("memory").queryName("gen_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_gen_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("gen_stream").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (0L until 500L))
  }

  test("options are case-insensitive (DSv2 contract) — lowercase rowsperbatch is honored") {
    // getTable receives the user's original keys; a case-sensitive
    // lookup silently ignored lowercase spellings and fell back to
    // the default. Batch count observably differs: 300/100 = 3
    // micro-batches (vs 1 under the ignored-option default of 1000).
    val q = spark.readStream.format("graft.sources.GeneratorSource")
      .option("N", 300).option("PARTITIONS", 2).option("rowsperbatch", 100)
      .load()
      .writeStream.format("memory").queryName("gen_ci_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_gen_ci_ckpt").toString)
      .start()
    val batches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    val got = spark.table("gen_ci_stream").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (0L until 300L))
    assert(batches === 3, s"expected 3 micro-batches of 100, saw $batches")
  }

  test("the reference's fizzbuzz workload runs on the custom source") {
    val words = gen(15, 1)
      .select(when(col("val") % 15 === 0, "fizzbuzz")
        .when(col("val") % 3 === 0, "fizz")
        .when(col("val") % 5 === 0, "buzz")
        .otherwise(col("val").cast("string")).as("word"))
      .collect().map(_.getString(0))
    assert(words(0) === "fizzbuzz") // 0 % 15 == 0
    assert(words(3) === "fizz")
    assert(words(5) === "buzz")
    assert(words(7) === "7")
  }
}
