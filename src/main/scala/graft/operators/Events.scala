package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Event-stream analytics over the `events` table (SURVEY.md §7.1 B3).
  *
  * blow's pipelines are push-based and stream-shaped
  * (`/root/reference/maps/maps.go:44-47`) but its only shipped workload
  * is finite — the batch-window formulations here are the semantic
  * equivalent; `graft.streaming.EventStreams` carries the Structured
  * Streaming twin (watermark + windowed agg) for the unbounded case.
  *
  * `ts` arrives as epoch-nanos long (see Tables.events). All bucketing
  * is exact integer arithmetic (`DIV`), never double division — at
  * 100 TB, double rounding near bucket edges would misassign rows.
  */
object Events {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val GapNs = 1800L * 1000 * 1000 * 1000 // 30 min session gap

  /** q17 — tumbling 1-hour windows: count/sum/avg per (hour, type).
    * One shuffle on the composite group key; partial aggregation
    * makes the shuffle O(buckets), not O(events). */
  def q17(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("hour_bucket", expr(s"ts DIV $HourNs"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("n_events"),
        // decimal sums are exact (associative), so partial-aggregation
        // order can't perturb the value; and rounding is the explicit
        // floor(x·10^k + 0.5)/10^k — Spark's round() goes through
        // Java's shortest-decimal string and disagrees with DuckDB's
        // exact-binary rounding precisely at .5·10^-k boundaries
        // (observed at sf0.1). floor arithmetic is plain IEEE on both.
        (floor(sum(col("value").cast("decimal(18,6)")).cast("double") * 100 + 0.5) / 100)
          .as("sum_value"),
        (floor(sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1)) * 10000 + 0.5) / 10000)
          .as("avg_value"))
      .orderBy("hour_bucket", "event_type")

  val q17Sql: String =
    s"""SELECT epoch_ns(ts) // $HourNs AS hour_bucket, event_type,
       | count(*) AS n_events,
       | floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_value,
       | floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_value
       |FROM events
       |GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin

  /** q18 — gap-based sessionization (30-min inactivity): the classic
    * lag → new-session flag → running-sum session id, then per-session
    * rollup. Two window passes + one agg, all partitioned by user_id —
    * a single shuffle lineage at any scale. Streaming twin:
    * `session_window($"ts", "30 minutes")`. */
  def q18(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > GapNs, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_sess").over(cum).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("start_ns"),
        max("ts").as("end_ns"),
        graft.functions.OracleRound.floorRound(
          graft.functions.OracleRound.exactSum(col("value")), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  val q18Sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, epoch_ns(ts) AS ns, value,
       |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
       |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > $GapNs
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
       |), sess AS (
       |  SELECT user_id, ns, value,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ns, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged
       |)
       |SELECT user_id, session_id, count(*) AS n_events,
       | min(ns) AS start_ns, max(ns) AS end_ns,
       | floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_value
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** q19 — semi-structured extraction: pull `k` out of the JSON props
    * column and aggregate per event type. get_json_object is a
    * codegen'd Catalyst expression — no UDF, stays in the
    * WholeStageCodegen span. */
  def q19(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("k_val").as("sum_k"),
        round(avg("k_val"), 4).as("avg_k"),
        min("k_val").as("min_k"),
        max("k_val").as("max_k"))
      .orderBy("event_type")

  val q19Sql: String =
    """SELECT event_type, count(*) AS n_events,
      | CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | round(avg(CAST(json_extract_string(props,'$.k') AS BIGINT)),4) AS avg_k,
      | min(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS min_k,
      | max(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q20 — as-of join: for every purchase, the most recent 'view' by
    * the same user at or before it. Implemented as a running
    * conditional max over a single user-partitioned sort — ONE shuffle,
    * no range-join explosion (the naive t1⋈t2 ON ts<=ts join is
    * quadratic per user; this is the scale-safe formulation Spark
    * lacks as a built-in operator). */
  def q20(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("last_view_ns",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ns"),
        col("last_view_ns"),
        graft.functions.OracleRound.floorRound(col("value"), 2).as("value"))
      .orderBy("event_id")
  }

  val q20Sql: String =
    """SELECT event_id, user_id, purchase_ns, last_view_ns, value FROM (
      |  SELECT event_id, user_id, event_type,
      |    epoch_ns(ts) AS purchase_ns,
      |    max(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END)
      |      OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ns,
      |    floor(value * 100 + 0.5) / 100 AS value
      |  FROM events) t
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** q55 — range (interval) join: every purchase matched to ALL of the
    * same user's views in the preceding 30 minutes. The naive
    * formulation is an equi-join on user plus a range predicate —
    * quadratic per user at scale. This plan bands time into gap-width
    * buckets and joins on (user, bucket) with each purchase probing
    * its own and the previous bucket — any view within the interval
    * is in one of the two (interval length = band width), so the
    * equi-join prunes candidates to O(events per 2 buckets) and the
    * exact range filter finishes. The standard distributed range-join
    * rewrite; streaming twin is EventStreams.viewPurchaseJoin. */
  def q55(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      .withColumn("bucket", expr(s"v_ts DIV $GapNs"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      .select(col("*"), explode(expr(s"array(p_ts DIV $GapNs, p_ts DIV $GapNs - 1)")).as("bucket"))
    purchases.join(views, Seq("user_id", "bucket"))
      .filter(col("v_ts") <= col("p_ts") && col("v_ts") >= col("p_ts") - GapNs)
      .select("purchase_id", "view_id", "user_id")
      .distinct()
      .orderBy("purchase_id", "view_id")
  }

  val q55Sql: String =
    s"""SELECT DISTINCT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
       |FROM events p JOIN events v
       |  ON p.user_id = v.user_id
       | AND p.event_type = 'purchase' AND v.event_type = 'view'
       | AND epoch_ns(v.ts) <= epoch_ns(p.ts)
       | AND epoch_ns(v.ts) >= epoch_ns(p.ts) - $GapNs
       |ORDER BY purchase_id, view_id""".stripMargin

  /** q60 — sessionization via the BUILT-IN `session_window`, batch
    * path (q18 is the hand-rolled lag/running-sum twin; the streaming
    * variant lives in streaming/EventStreams). Exercises the operator
    * Spark actually ships for this: one shuffle on user_id, sessions
    * merged by the 30-min gap. Boundary semantics differ from q18 by
    * design: `session_window` starts a NEW session when the gap is ≥
    * the duration (windows are half-open [ts, ts+gap)), while q18's
    * flag uses strictly >; the oracle mirrors the built-in exactly,
    * so the two queries stay independently verifiable. ts is µs-
    * truncated at load (Tables.events), so the long↔timestamp round
    * trip is exact. */
  def q60(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("tstamp", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(col("user_id"), session_window(col("tstamp"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.OracleRound.floorRound(
          graft.functions.OracleRound.exactSum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        (unix_micros(col("sw.start")) * 1000).as("start_ns"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_ns")

  val q60Sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, epoch_ns(ts) AS ns, value,
       |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
       |           OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w >= $GapNs
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
       |), sess AS (
       |  SELECT user_id, ns, value,
       |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ns, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged
       |)
       |SELECT user_id, min(ns) AS start_ns, count(*) AS n_events,
       | floor(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_value
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, start_ns""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_range_join" -> q55 _,
    "q17_hourly_windows" -> q17 _,
    "q18_sessionization" -> q18 _,
    "q19_json_extract" -> q19 _,
    "q20_asof_join" -> q20 _,
    "q60_session_window" -> q60 _)

  val oracles: Map[String, String] = Map(
    "q55_range_join" -> q55Sql,
    "q17_hourly_windows" -> q17Sql,
    "q18_sessionization" -> q18Sql,
    "q19_json_extract" -> q19Sql,
    "q20_asof_join" -> q20Sql,
    "q60_session_window" -> q60Sql)
}
