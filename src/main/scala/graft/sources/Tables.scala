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

  /** Canonical `events.ts` contract for every downstream query: a
    * plain BIGINT of epoch NANOseconds (UTC), truncated to microsecond
    * precision. The fixture's physical type has varied across driver
    * regenerations, so the loader normalizes adaptively:
    *
    *  - INT64 TIMESTAMP(NANOS) (early fixtures): Spark 4.1.2 rejects
    *    it natively; `nanosAsLong` reads it as epoch-nanos long, then
    *    truncate to µs — DuckDB's parquet reader truncates
    *    TIMESTAMP_NS to µs, so the oracle only ever sees µs values,
    *    and truncating here keeps gaps/buckets/raw output
    *    bit-identical on both sides.
    *  - timestamp[us] (current fixtures): Spark reads TIMESTAMP_NTZ;
    *    `timestampdiff(MICROSECOND, NTZ-epoch, ts) * 1000` recovers
    *    the same epoch-nanos long with NO session-timezone dependence
    *    — NTZ−NTZ arithmetic is pure wall-clock, the same
    *    naive-as-UTC reading DuckDB applies. (A cast through
    *    TIMESTAMP would go via the session zone, turning the loader
    *    into an order-dependent global for non-UTC sessions.)
    *  - TIMESTAMP (tz-adjusted, would appear if a future generation
    *    writes isAdjustedToUTC): `unix_micros` directly — absolute
    *    instants need no zone.
    *
    * Either way the oracle side is unchanged: DuckDB sees a µs
    * timestamp in both generations and the oracle SQLs convert with
    * epoch_ns()/epoch-style arithmetic as each query documents.
    * OperatorSpec pins the contract AND its session-zone
    * independence. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("(ts DIV 1000) * 1000"))
      case TimestampNTZType => raw.withColumn("ts", expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) * 1000L"))
      case _ => raw.withColumn("ts", expr("unix_micros(ts) * 1000L"))
    }
  }

  /** Cheap corpus fingerprint for JVM-lifetime memos (trained
    * centroids, PQ codebooks, the overlap-pair index): canonical dir
    * path + each named table's file sizes and mtimes. Memos keyed by
    * this instead of the bare path re-build when the data at the path
    * changes within a session, so a regenerated fixture can never be
    * served stale driver state. Directory-shaped tables (the 100 TB
    * case: one dir of many part files) are walked one level — file
    * listing is a driver-side O(files) stat, the same metadata a scan
    * planning pass reads anyway. The walk is FULLY recursive (a
    * partitioned table dir's subdirectory mtime does not change when
    * a nested part file is rewritten in place — only the leaf stats
    * detect it) and null-safe (`listFiles` returns null on an I/O
    * error or a regeneration race; an unreadable dir contributes a
    * distinct marker so the fingerprint still changes vs the
    * readable state). */
  def fingerprint(sfDir: String, tables: Seq[String]): String = {
    def stat(f: java.io.File): Seq[String] =
      if (f.isDirectory)
        Option(f.listFiles()) match {
          case Some(children) =>
            children.sortBy(_.getName).toSeq.flatMap { c =>
              stat(c).map(s => s"${f.getName}/$s")
            }
          case None => Seq(s"${f.getName}:unreadable")
        }
      else Seq(s"${f.getName}:${f.length}:${f.lastModified}")
    val dir = new java.io.File(sfDir).getCanonicalPath
    val parts = tables.sorted.flatMap(t => stat(new java.io.File(s"$dir/$t.parquet")))
    s"$dir|${parts.mkString(",")}"
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
