package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming twin of the batch event analytics
  * (SURVEY.md §2.6 streaming row): blow's pipelines are push-based and
  * conceptually unbounded (`/root/reference/maps/maps.go:44-47` — a
  * Generator may emit forever; stages run as data arrives), but its
  * only shipped workload is finite, so batch is the primary surface.
  * This module is the documented growth path: the same aggregations
  * expressed over `readStream`, with watermarks bounding state.
  *
  * At 100 TB/day these run as continuous jobs: watermark + windowed
  * agg state lives in the state store partitioned by group key —
  * identical shuffle shape to the batch plans, plus state GC.
  */
object EventStreams {

  /** Schema of the events table with `ts` as a proper timestamp
    * (streaming sources deliver decoded records, not raw parquet, so
    * the NANOS workaround doesn't apply here). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded twin of q17: tumbling 1-hour windows per event type,
    * 10-minute watermark for late data. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Unbounded twin of q18: gap-based sessions via the built-in
    * session_window (30-minute inactivity gap) — Spark manages the
    * merge/extend state that the batch formulation derives with
    * lag + running sum. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"),
        col("sum_value"))

  /** Read a directory of JSON event files as an unbounded stream —
    * the file-source analog of blow's Generator feeding a channel.
    * `maxFilesPerTrigger` > 0 throttles ingestion to that many files
    * per micro-batch — the lever tests use to force MULTIPLE
    * micro-batches over finite input, so cross-batch state-merge
    * paths actually execute instead of collapsing into one batch. */
  def readEventStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.schema(eventSchema)
    val r2 = if (maxFilesPerTrigger > 0)
      r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r
    r2.json(dir)
  }

  /** Streaming dedup on a key with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps each key's state only
    * until the watermark passes its event time + delay, so state is
    * O(keys per 10-minute window), not O(keys ever seen). Plain
    * `dropDuplicates("event_id")` would NOT get that: when the
    * event-time column is not among the dedup keys the watermark is
    * ignored for state cleanup and state grows forever — the classic
    * unbounded-state bug. The guarantee here is the one a 100 TB
    * ingest dedup actually provides: duplicates arriving within the
    * watermark delay of first sight are dropped; a duplicate arriving
    * later than 10 minutes may be admitted. Batch twin:
    * `dropDuplicates("event_id")` (exact, bounded input). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** Stream-stream interval join: each purchase joined to the same
    * user's views in the preceding 30 minutes. Both sides carry
    * watermarks and the join condition bounds event time on both
    * ends, so Spark can GC join state — the required shape for an
    * unbounded⋈unbounded join (state is O(events within the
    * interval), not O(stream)). Batch twin: the same equi+range
    * condition on the static table. */
  def viewPurchaseJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"))
  }

  /** Durable sink: append the stream to parquet with a checkpoint —
    * the production egress. The checkpoint (WAL + source offsets)
    * makes the sink exactly-once across restarts: re-starting the
    * same (query, checkpoint) pair resumes from the recorded offsets
    * and never re-writes delivered batches. At 100 TB/day this is the
    * bronze-layer landing job; partition the output by event date for
    * downstream pruning. Blocks until currently-available input is
    * drained (AvailableNow). */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }

  /** Run a streaming DataFrame to completion over currently-available
    * data via the memory sink (test/smoke harness — mirrors the
    * guide's processAllAvailable pattern). Returns the query; caller
    * reads `spark.table(name)`. */
  def runToMemory(df: DataFrame, name: String,
      outputMode: String = "append"): StreamingQuery = {
    val q: DataStreamWriter[org.apache.spark.sql.Row] = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
    val started = q.start()
    started.processAllAvailable()
    started
  }
}
