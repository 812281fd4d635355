package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Centralized readers for the driver-generated parquet tables
  * (`FIXTURES.md`). The reference's only source is an in-process
  * generator (`/root/reference/maps/maps.go:8-10`); the Spark-native
  * equivalent of "a source of typed records" is a parquet scan with
  * Catalyst pushdown — filters and column pruning reach the scan, so
  * callers should filter/select immediately rather than caching wide.
  *
  * 100 TB notes: at scale each table is a directory of many parquet
  * files; `spark.read.parquet(dir)` parallelizes splits via
  * `spark.sql.files.maxPartitionBytes`. Nothing here materializes to
  * the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS) which Spark 4.1.2
    * rejects natively; `nanosAsLong` reads it as epoch-nanos long
    * (verified on this image — see FIXTURES.md). The driver's sessions
    * do not set the flag, so it is set here, inside the query path.
    * The resulting `ts` column is a plain long (epoch nanoseconds, UTC),
    * truncated to microsecond precision: DuckDB's parquet reader
    * truncates TIMESTAMP_NS to µs, so the oracle only ever sees
    * µs-resolution values — truncating here keeps every downstream
    * comparison (gaps, buckets, raw output) bit-identical on both
    * sides (verified: without this, sub-µs digits hash-mismatch).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("(ts DIV 1000) * 1000"))
  }

  /** Register every fixture table as a temp view (events with the
    * ns-workaround applied), so the full ANSI surface is available via
    * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")` — temp
    * views are metadata only; plans still prune and push down into the
    * parquet scans exactly like the DataFrame API. */
  def registerAll(s: SparkSession, d: String): Unit =
    all.foreach { name =>
      val df = if (name == "events") events(s, d) else load(s, d, name)
      df.createOrReplaceTempView(name)
    }
}
