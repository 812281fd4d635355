package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CacheScope.Ops
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

  /** q119 EWMA lookback (rows, not hours: the operational bounded
    * definition below). */
  private val EwmaLookback = 16

  /** q119 — EWMA smoothing of hourly telemetry (α = 0.5): each
    * (event_type, hour)'s total is smoothed against its trailing
    * observations with halving weights — the standard dashboard
    * smoother / burst detector baseline. Operational definition:
    * bounded to the last 16 observations and renormalized,
    * ewma_t = Σ_{k=1..m} 2^-k · x_{t-k+1} / Σ_{k=1..m} 2^-k —
    * exactly computable (no infinite tail), identical at any
    * parallelism.
    *
    * Cross-engine determinism: α = 0.5 is chosen so every weight
    * 2^-k is an EXACT double (no libm hazard — contrast the ln
    * lesson on q114); products of bit-identical inputs are correctly
    * rounded IEEE, and both numerator and denominator sum in DECIMAL
    * (order-independent) before one division. The hourly rollup is
    * the only corpus-sized stage (persisted: the trailing join
    * consumes it twice and it is O(types × hours) — tiny); the
    * trailing window is a bounded self-join on (type, rn distance ≤
    * 16), a ≤16× expansion of the compact rollup, never of raw
    * events. */
  def q119(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .withColumn("hour_bucket", expr(s"ts DIV $HourNs"))
      .groupBy("event_type", "hour_bucket")
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("x"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("hour_bucket")))
      // Eager localCheckpoint, NOT persist: the trailing self-join
      // consumes this O(types x hours) rollup twice, but a persist
      // has no caller-visible release point (the q101 leak class) -
      // checkpoint blocks are released at the harness's
      // drainCheckpoints(), with the ContextCleaner as the
      // non-harness backstop once the returned plan is GC'd.
      .localCheckpoint()
      .transform(graft.functions.CacheScope.registerCheckpoint)
    val cur = hourly.select(col("event_type"), col("hour_bucket"),
      col("x"), col("rn"))
    val past = hourly.select(col("event_type").as("p_type"),
      col("x").as("px"), col("rn").as("prn"))
    cur.join(past, col("p_type") === col("event_type") &&
        col("prn") >= col("rn") - (EwmaLookback - 1) && col("prn") <= col("rn"))
      .withColumn("w", expr("pow(2.0, -(rn - prn + 1))"))
      .withColumn("term", (col("px") * col("w")).cast("decimal(28,14)"))
      .withColumn("wd", col("w").cast("decimal(28,14)"))
      .groupBy("event_type", "hour_bucket")
      .agg(max("x").as("xm"),
        (sum("term").cast("double") / sum("wd").cast("double")).as("ewma_raw"))
      .select(col("event_type"), col("hour_bucket"),
        graft.functions.OracleRound.floorRound(col("xm"), 2).as("x"),
        graft.functions.OracleRound.floorRound(col("ewma_raw"), 4).as("ewma"))
      .orderBy("event_type", "hour_bucket")
  }

  val q119Sql: String =
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_ns(ts) // $HourNs AS hour_bucket,
       |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT event_type, hour_bucket, x,
       |    row_number() OVER (PARTITION BY event_type ORDER BY hour_bucket) AS rn
       |  FROM hourly),
       |j AS (
       |  SELECT c.event_type, c.hour_bucket, c.x,
       |    CAST(p.x * pow(2.0, -(c.rn - p.rn + 1)) AS DECIMAL(28,14)) AS term,
       |    CAST(pow(2.0, -(c.rn - p.rn + 1)) AS DECIMAL(28,14)) AS wd
       |  FROM r c JOIN r p ON p.event_type = c.event_type
       |    AND p.rn BETWEEN c.rn - ${EwmaLookback - 1} AND c.rn)
       |SELECT event_type, hour_bucket,
       |  ${graft.functions.OracleRound.floorRoundSql("max(x)", 2)} AS x,
       |  ${graft.functions.OracleRound.floorRoundSql(
           "CAST(sum(term) AS DOUBLE) / CAST(sum(wd) AS DOUBLE)", 4)} AS ewma
       |FROM j GROUP BY event_type, hour_bucket
       |ORDER BY event_type, hour_bucket""".stripMargin

  /** q120 attribution lookback. */
  private val AttribWindowNs = 7L * 24 * 3600 * 1000 * 1000 * 1000

  /** q120 — first-touch attribution: every purchase is credited to
    * the user's EARLIEST view/click in the 7 days before it (the
    * classic marketing-attribution report), with unmatched purchases
    * reported under 'none'. First-touch selection is ONE mergeable
    * aggregate - min over (ts, event_id, type) structs, lexicographic
    * = earliest ts with id tie-break - never a per-purchase window
    * sort, so a bot user with millions of touches costs
    * partial-aggregate rows, not one sorted partition (the q87/q117
    * skew rule). The candidate join is the q55 time-banded rewrite:
    * joining on user_id alone would make the per-user intermediate
    * |purchases|×|touches| — a bot user explodes one key's output in a
    * way AQE skew-split cannot repair (it rebalances partitions, not
    * row counts). Instead touches carry a window-width time bucket and
    * each purchase probes its own and the previous bucket — any touch
    * inside (pts − 7d, pts] lands in one of the two (interval length =
    * band width), so candidates are bounded per (user, bucket) and the
    * exact range filter finishes. A touch has ONE bucket and the two
    * probe values are distinct, so the rewrite introduces no
    * duplicates. Revenue sums in DECIMAL. */
  def q120(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pts"), col("value").as("revenue"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_id").as("touch_id"), col("event_type").as("touch_type"))
      .withColumn("bucket", expr(s"tts DIV $AttribWindowNs"))
    val cand = purchases
      .select(col("purchase_id"), col("user_id"), col("pts"),
        explode(expr(s"array(pts DIV $AttribWindowNs, pts DIV $AttribWindowNs - 1)")).as("bucket"))
      .join(touches, Seq("user_id", "bucket"))
      .filter(col("tts") <= col("pts") && col("tts") > col("pts") - AttribWindowNs)
      .select("purchase_id", "tts", "touch_id", "touch_type")
    // ONE mergeable aggregate (the q117 pattern): min over
    // (ts, touch_id, touch_type) structs IS lexicographic
    // first-touch-with-id-tiebreak; cand is an inner join, so no
    // null-field structs ever enter the buffer.
    val firstTouch = cand.groupBy("purchase_id")
      .agg(min(struct(col("tts"), col("touch_id"), col("touch_type"))).as("ft"))
      .select(col("purchase_id"), col("ft.touch_type").as("touch_type"))
    purchases.join(firstTouch, Seq("purchase_id"), "left")
      .withColumn("touch", coalesce(col("touch_type"), lit("none")))
      .groupBy("touch")
      .agg(count(lit(1)).as("n_purchases"),
        graft.functions.OracleRound.floorRound(
          graft.functions.OracleRound.exactSum(col("revenue")), 2).as("revenue"))
      .orderBy("touch")
  }

  val q120Sql: String =
    s"""WITH p AS (
       |  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS pts,
       |    value AS revenue
       |  FROM events WHERE event_type = 'purchase'),
       |t AS (
       |  SELECT user_id, epoch_ns(ts) AS tts, event_id AS touch_id,
       |    event_type AS touch_type
       |  FROM events WHERE event_type IN ('view', 'click')),
       |cand AS (
       |  SELECT p.purchase_id, t.tts, t.touch_id, t.touch_type
       |  FROM p JOIN t ON p.user_id = t.user_id
       |  WHERE t.tts <= p.pts AND t.tts > p.pts - $AttribWindowNs),
       |fts AS (SELECT purchase_id, min(tts) AS fts FROM cand GROUP BY 1),
       |fid AS (
       |  SELECT c.purchase_id, min(c.touch_id) AS fid
       |  FROM cand c JOIN fts f ON c.purchase_id = f.purchase_id
       |  WHERE c.tts = f.fts GROUP BY 1),
       |ft AS (
       |  SELECT c.purchase_id, c.touch_type
       |  FROM cand c JOIN fid i ON c.purchase_id = i.purchase_id
       |    AND c.touch_id = i.fid)
       |SELECT coalesce(ft.touch_type, 'none') AS touch,
       |  count(*) AS n_purchases,
       |  ${graft.functions.OracleRound.floorRoundSql(
           graft.functions.OracleRound.exactSumSql("p.revenue"), 2)} AS revenue
       |FROM p LEFT JOIN ft ON p.purchase_id = ft.purchase_id
       |GROUP BY 1 ORDER BY touch""".stripMargin

  /** q153 anonymity threshold and QID granularity: day buckets ×
    * 10 value bands over the fixture's 0–490 range put the mean
    * group size near k at the gate scale, so the audit reports a
    * genuine MIX of safe and at-risk groups — the regime it exists
    * to measure — instead of a degenerate all-safe or all-risk
    * answer. */
  // private[graft]: the streaming release-gate monitor
  // (streaming/StatefulOps.anonymityMonitor) must share the SAME
  // threshold and QID granularity as the batch audits.
  private[graft] val AnonK = 5L
  private[graft] val ValueBandWidth = 50L
  private[graft] val DayNs = 24L * 3600 * 1000 * 1000 * 1000

  /** THE quasi-identifier tuple — one definition consumed by both
    * q153 (k-anonymity) and q155 (l-diversity) on both engines, so
    * the two audits can never group different universes. BOTH
    * buckets use FLOOR division, via the explicit largest-multiple
    * form on BOTH engines: Spark's `DIV` and DuckDB 1.0's `//` BOTH
    * truncate toward zero (measured — `(-101)//50` = −2 there, not
    * the floored −3; the r8 oracle's bare `//` therefore did NOT
    * floor, and a pre-epoch sentinel timestamp would have bucketed
    * differently per engine — caught by the r9 review). The value
    * band floors on the shared IEEE double (exact — values are
    * small). The day bucket CANNOT go through a double (epoch-nanos
    * ≈ 1.7·10¹⁸ exceeds the 2⁵³ exact-integer range), so both sides
    * subtract the non-negative pmod first: ts − pmod(ts, d) is the
    * largest multiple of d ≤ ts, and an exact multiple divides
    * exactly under truncation OR floor semantics — floor-exact and
    * engine/version-independent for every BIGINT including
    * pre-epoch negatives. */
  private val qidSparkExprs: Seq[String] = Seq(
    "event_type",
    s"(ts - pmod(ts, $DayNs)) DIV $DayNs AS day_bucket",
    s"CAST(floor(value / $ValueBandWidth) AS BIGINT) AS value_band")

  private val qidSqlExprs: String =
    s"""event_type,
       |    (epoch_ns(ts) - ((epoch_ns(ts) % $DayNs + $DayNs) % $DayNs)) // $DayNs AS day_bucket,
       |    CAST(floor(value / $ValueBandWidth) AS BIGINT) AS value_band""".stripMargin

  /** q153 — k-anonymity audit over quasi-identifiers: before
    * event-derived features join a training corpus, group the table
    * by its quasi-identifier tuple (event_type, day bucket,
    * value band) and measure re-identification exposure per event
    * type — group count, smallest group, and how many ROWS sit in
    * groups below k=5 (the rows a release would have to suppress or
    * generalize). The data-governance gate the privacy literature
    * runs before any telemetry release; q78 scrubs direct
    * identifiers IN text, this audits indirect (quasi-) identifiers
    * in structured data — the two halves of the PII story.
    *
    * Scale shape: one scan → map-side-combined QID aggregate
    * (O(distinct QID tuples), domain-bounded: types × days × bands)
    * → an O(QID-groups) rollup to O(types) rows. Day and band come
    * from exact integer arithmetic (`DIV` on epoch-nanos, floor on
    * the same IEEE double), so group membership is engine-exact;
    * every reported number except risk_share is an integer. */
  def q153(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.OracleRound.floorRound
    Tables.events(spark, sfDir)
      .selectExpr(qidSparkExprs: _*)
      .groupBy("event_type", "day_bucket", "value_band")
      .agg(count(lit(1)).as("gs"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
        sum("gs").as("n_rows"),
        min("gs").as("min_group"),
        count(when(col("gs") < AnonK, 1)).as("n_small_groups"),
        sum(when(col("gs") < AnonK, col("gs")).otherwise(lit(0L)))
          .as("n_rows_at_risk"),
        floorRound(
          sum(when(col("gs") < AnonK, col("gs")).otherwise(lit(0L)))
            .cast("double") / sum("gs").cast("double"), 6).as("risk_share"))
      .orderBy("event_type")
  }

  val q153Sql: String = {
    import graft.functions.OracleRound.floorRoundSql
    s"""WITH q AS (
       |  SELECT $qidSqlExprs
       |  FROM events),
       |g AS (
       |  SELECT event_type, day_bucket, value_band, count(*) AS gs
       |  FROM q GROUP BY 1, 2, 3)
       |SELECT event_type, count(*) AS n_groups,
       |  CAST(sum(gs) AS BIGINT) AS n_rows,
       |  CAST(min(gs) AS BIGINT) AS min_group,
       |  CAST(count(CASE WHEN gs < $AnonK THEN 1 END) AS BIGINT)
       |    AS n_small_groups,
       |  CAST(sum(CASE WHEN gs < $AnonK THEN gs ELSE 0 END) AS BIGINT)
       |    AS n_rows_at_risk,
       |  ${floorRoundSql(
            s"CAST(sum(CASE WHEN gs < $AnonK THEN gs ELSE 0 END) AS DOUBLE) " +
              "/ CAST(sum(gs) AS DOUBLE)", 6)} AS risk_share
       |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** q155 diversity threshold: a QID group whose rows belong to
    * fewer than 3 distinct users is homogeneity-attackable. */
  private val DiversityL = 3L

  /** q155 — l-diversity audit, the homogeneity-attack companion to
    * q153: a QID group can be large (k-anonymous) yet still leak if
    * all its rows belong to one or two USERS — the sensitive
    * attribute is homogeneous, so matching the group IS the
    * disclosure. Same QID tuple as q153 (one definition of the
    * grouping on both engines); per event type: groups whose rows
    * span fewer than l=3 distinct users, the rows inside them, and
    * the worst group's distinct-user count. Together q153/q155 are
    * the size and diversity halves of the release gate.
    *
    * Scale shape: the only change vs q153 is the inner aggregate
    * carrying count(DISTINCT user_id) — Spark expands it to a
    * two-phase (QID, user) pre-aggregate, still map-side combined
    * and domain-bounded (QIDs × users-per-QID ≤ rows); everything
    * downstream is the same O(QID-groups) → O(types) rollup. */
  def q155(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.OracleRound.floorRound
    Tables.events(spark, sfDir)
      .selectExpr(qidSparkExprs :+ "user_id": _*)
      .groupBy("event_type", "day_bucket", "value_band")
      .agg(count(lit(1)).as("gs"),
        countDistinct(col("user_id")).as("du"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
        sum("gs").as("n_rows"),
        min("du").as("min_distinct_users"),
        count(when(col("du") < DiversityL, 1)).as("n_homog_groups"),
        sum(when(col("du") < DiversityL, col("gs")).otherwise(lit(0L)))
          .as("n_rows_homog"),
        floorRound(
          sum(when(col("du") < DiversityL, col("gs")).otherwise(lit(0L)))
            .cast("double") / sum("gs").cast("double"), 6)
          .as("homog_share"))
      .orderBy("event_type")
  }

  val q155Sql: String = {
    import graft.functions.OracleRound.floorRoundSql
    s"""WITH q AS (
       |  SELECT $qidSqlExprs,
       |    user_id
       |  FROM events),
       |g AS (
       |  SELECT event_type, day_bucket, value_band, count(*) AS gs,
       |    count(DISTINCT user_id) AS du
       |  FROM q GROUP BY 1, 2, 3)
       |SELECT event_type, count(*) AS n_groups,
       |  CAST(sum(gs) AS BIGINT) AS n_rows,
       |  CAST(min(du) AS BIGINT) AS min_distinct_users,
       |  CAST(count(CASE WHEN du < $DiversityL THEN 1 END) AS BIGINT)
       |    AS n_homog_groups,
       |  CAST(sum(CASE WHEN du < $DiversityL THEN gs ELSE 0 END) AS BIGINT)
       |    AS n_rows_homog,
       |  ${floorRoundSql(
            s"CAST(sum(CASE WHEN du < $DiversityL THEN gs ELSE 0 END) AS DOUBLE) " +
              "/ CAST(sum(gs) AS DOUBLE)", 6)} AS homog_share
       |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** q170 exposure threshold on the noise-normalized closeness
    * statistic z = emd · √n_g (see the q170 scaladoc): calibrated for
    * a genuine flagged/safe MIX on the synthetic fixture at every
    * tested scale (68/50/13 of 150 groups at sf0.001/0.01/0.1) — a
    * FIXED t on emd itself would be degenerate across scales, because
    * a uniform corpus's group-to-global distance shrinks as 1/√n_g
    * (sampling noise), which is exactly what z divides out. */
  private[graft] val TclosenessLambda = 0.18

  /** q170 — t-closeness audit (Li, Li, Venkatasubramanian 2007), the
    * third leg of the release gate: a QID group can be large (q153)
    * and user-diverse (q155) yet still leak if its SENSITIVE-attribute
    * distribution diverges from the table's — matching the group then
    * shifts the adversary's posterior about the sensitive value. QID
    * here is (event_type, day_bucket); the sensitive attribute is the
    * ORDERED value band (same band definition as q153/q155, one
    * bucketing discipline across the gate). Distance is the ordered
    * Earth-Mover's Distance of the t-closeness paper:
    * emd = Σᵢ|Σ_{j≤i}(p_j − q_j)| / (m−1) over the m global bands in
    * band order. Because uniform-data emd shrinks as 1/√n_g, the
    * audit flags on the noise-NORMALIZED z = emd·√n_g > λ — "the
    * group's distance exceeds its own sampling-noise floor", a
    * dimensionless criterion that keeps meaning at any corpus size
    * where any fixed t goes all-safe or all-risk.
    *
    * Scale shape: one scan → a map-combined (type, day, band)
    * aggregate; EVERYTHING downstream — the group/global/total
    * rollups, the grid join, the band-ordered prefix-sum window —
    * runs on that domain-bounded relation (types × days × bands
    * rows), so no corpus-sized shuffle exists past the first
    * aggregate and AQE broadcasts the tiny join sides from measured
    * size. Determinism: the prefix sums are EXACT — c·N and C·n_g
    * cross-multiplied in DECIMAL (c·N ≤ N², in range to N ≈ 10¹⁹
    * rows); emd and z then derive from identical double expression
    * trees on both engines (the shared-formula discipline: division,
    * sqrt, and multiplication are all IEEE-correctly-rounded), and
    * every reported ratio goes through floorRound. */
  def q170(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.OracleRound.floorRound
    val g = Tables.events(spark, sfDir)
      .selectExpr(qidSparkExprs: _*)
      .groupBy("event_type", "day_bucket", "value_band")
      .agg(count(lit(1)).as("c"))
      .scopedCache // four domain-bounded consumers (grp/gb/tot/grid)
    g.count()
    val grp = g.groupBy("event_type", "day_bucket").agg(sum("c").as("n_g"))
    val gb = g.groupBy("event_type", "value_band").agg(sum("c").as("cg"))
    val tot = g.groupBy("event_type")
      .agg(sum("c").as("n"), countDistinct("value_band").as("m"))
    val grid = grp.join(gb, "event_type").join(tot, "event_type")
      .join(g.withColumnRenamed("c", "c0"),
        Seq("event_type", "day_bucket", "value_band"), "left")
      .withColumn("c", coalesce(col("c0"), lit(0L)))
    val w = Window.partitionBy("event_type", "day_bucket")
      .orderBy("value_band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.withColumn("cumd",
      sum(col("c").cast("decimal(19,0)") * col("n") -
        col("cg").cast("decimal(19,0)") * col("n_g")).over(w))
    val perGroup = cum
      .groupBy("event_type", "day_bucket", "n_g", "n", "m")
      .agg(sum(abs(col("cumd"))).as("num"))
      .withColumn("emd", when(col("m") > 1,
        col("num").cast("double") /
          ((col("m") - 1).cast("double") * col("n_g") * col("n")))
        .otherwise(lit(0.0)))
      .withColumn("z", col("emd") * sqrt(col("n_g").cast("double")))
    perGroup.groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"),
        sum("n_g").as("n_rows"),
        max("m").as("n_bands"),
        floorRound(max(col("emd")), 6).as("max_emd"),
        floorRound(max(col("z")), 6).as("max_z"),
        count(when(col("z") > TclosenessLambda, 1)).as("n_exposed_groups"),
        sum(when(col("z") > TclosenessLambda, col("n_g")).otherwise(lit(0L)))
          .as("n_rows_exposed"),
        floorRound(
          sum(when(col("z") > TclosenessLambda, col("n_g")).otherwise(lit(0L)))
            .cast("double") / sum("n_g").cast("double"), 6).as("exposed_share"))
      .orderBy("event_type")
  }

  val q170Sql: String = {
    import graft.functions.OracleRound.floorRoundSql
    s"""WITH e AS (
       |  SELECT $qidSqlExprs
       |  FROM events),
       |g AS (
       |  SELECT event_type, day_bucket, value_band, count(*) AS c
       |  FROM e GROUP BY 1, 2, 3),
       |grp AS (
       |  SELECT event_type, day_bucket, CAST(sum(c) AS BIGINT) AS n_g
       |  FROM g GROUP BY 1, 2),
       |gb AS (
       |  SELECT event_type, value_band, CAST(sum(c) AS BIGINT) AS cg
       |  FROM g GROUP BY 1, 2),
       |tot AS (
       |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
       |    count(DISTINCT value_band) AS m
       |  FROM g GROUP BY 1),
       |grid AS (
       |  SELECT gr.event_type, gr.day_bucket, gl.value_band,
       |    gr.n_g, gl.cg, t.n, t.m, COALESCE(gc.c, 0) AS c
       |  FROM grp gr
       |  JOIN gb gl ON gr.event_type = gl.event_type
       |  JOIN tot t ON gr.event_type = t.event_type
       |  LEFT JOIN g gc ON gc.event_type = gr.event_type
       |    AND gc.day_bucket = gr.day_bucket
       |    AND gc.value_band = gl.value_band),
       |cum AS (
       |  SELECT event_type, day_bucket, n_g, n, m,
       |    sum(CAST(c AS DECIMAL(19,0)) * n - CAST(cg AS DECIMAL(19,0)) * n_g)
       |      OVER (PARTITION BY event_type, day_bucket ORDER BY value_band
       |            ROWS UNBOUNDED PRECEDING) AS cumd
       |  FROM grid),
       |pg AS (
       |  SELECT event_type, day_bucket, n_g,
       |    CASE WHEN m > 1 THEN
       |      CAST(sum(abs(cumd)) AS DOUBLE) / (CAST(m - 1 AS DOUBLE) * n_g * n)
       |    ELSE 0.0 END AS emd,
       |    CASE WHEN m > 1 THEN
       |      CAST(sum(abs(cumd)) AS DOUBLE) / (CAST(m - 1 AS DOUBLE) * n_g * n)
       |    ELSE 0.0 END * sqrt(CAST(n_g AS DOUBLE)) AS z,
       |    m
       |  FROM cum GROUP BY event_type, day_bucket, n_g, n, m)
       |SELECT event_type, count(*) AS n_groups,
       |  CAST(sum(n_g) AS BIGINT) AS n_rows,
       |  CAST(max(m) AS BIGINT) AS n_bands,
       |  ${floorRoundSql("max(emd)", 6)} AS max_emd,
       |  ${floorRoundSql("max(z)", 6)} AS max_z,
       |  CAST(count(CASE WHEN z > $TclosenessLambda THEN 1 END) AS BIGINT)
       |    AS n_exposed_groups,
       |  CAST(sum(CASE WHEN z > $TclosenessLambda THEN n_g ELSE 0 END) AS BIGINT)
       |    AS n_rows_exposed,
       |  ${floorRoundSql(
            s"CAST(sum(CASE WHEN z > $TclosenessLambda THEN n_g ELSE 0 END) AS DOUBLE) " +
              "/ CAST(sum(n_g) AS DOUBLE)", 6)} AS exposed_share
       |FROM pg GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** q173 — t-closeness DRIFT tier (r10 verdict item 2: q170 is
    * point-in-time; a release gate also needs to know whether
    * exposure is GETTING WORSE). Each event type's observed day range
    * splits at its midpoint into a REFERENCE window (day ≤ mid) and a
    * CURRENT window (day > mid) — per type, so the comparison is
    * self-contained per key (the same property that lets the
    * streaming twin compute it inside one flatMapGroupsWithState
    * key). Within each window the q170 audit runs verbatim — ordered
    * EMD of every (type, day) group against the WINDOW's own global
    * band distribution, noise-normalized z = emd·√n_g, λ exposure
    * flags — and the report compares the two: group/exposure counts
    * per window, max_z per window, z_drift = cur − ref, and an
    * exposure_drifted flag on the exposed-rows SHARE (integer
    * cross-multiplied in DECIMAL — no double compare decides the
    * flag). This follows the q142/q168 drift pattern: same statistic,
    * two time slices, one comparison row per key.
    *
    * Scale shape = q170's with a win column: one scan → the
    * map-combined (type, win, day, band) aggregate; everything
    * downstream runs on that domain-bounded relation. The per-type
    * (min, max) day aggregate is O(types) rows and joins back
    * broadcast. Determinism: the midpoint is floor((min+max)/2.0) —
    * one IEEE floor both engines share (day sums are far inside
    * 2⁵³, so the double is exact; integer `div`/`//` disagree across
    * engines on negative operands, which pre-epoch day buckets can
    * produce). */
  def q173(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.OracleRound.floorRound
    val e = Tables.events(spark, sfDir).selectExpr(qidSparkExprs: _*)
    val mids = e.groupBy("event_type")
      .agg(floor((min("day_bucket") + max("day_bucket")) / 2.0)
        .cast("long").as("mid_day"))
    val g = e.join(mids, "event_type")
      .withColumn("win",
        when(col("day_bucket") <= col("mid_day"), "ref").otherwise("cur"))
      .groupBy("event_type", "win", "day_bucket", "value_band")
      .agg(count(lit(1)).as("c"))
      .scopedCache // four domain-bounded consumers (grp/gb/tot/grid)
    g.count()
    val grp = g.groupBy("event_type", "win", "day_bucket").agg(sum("c").as("n_g"))
    val gb = g.groupBy("event_type", "win", "value_band").agg(sum("c").as("cg"))
    val tot = g.groupBy("event_type", "win")
      .agg(sum("c").as("n"), countDistinct("value_band").as("m"))
    val grid = grp.join(gb, Seq("event_type", "win"))
      .join(tot, Seq("event_type", "win"))
      .join(g.withColumnRenamed("c", "c0"),
        Seq("event_type", "win", "day_bucket", "value_band"), "left")
      .withColumn("c", coalesce(col("c0"), lit(0L)))
    val w = Window.partitionBy("event_type", "win", "day_bucket")
      .orderBy("value_band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.withColumn("cumd",
      sum(col("c").cast("decimal(19,0)") * col("n") -
        col("cg").cast("decimal(19,0)") * col("n_g")).over(w))
    val perGroup = cum
      .groupBy("event_type", "win", "day_bucket", "n_g", "n", "m")
      .agg(sum(abs(col("cumd"))).as("num"))
      .withColumn("emd", when(col("m") > 1,
        col("num").cast("double") /
          ((col("m") - 1).cast("double") * col("n_g") * col("n")))
        .otherwise(lit(0.0)))
      .withColumn("z", col("emd") * sqrt(col("n_g").cast("double")))
    val perWin = perGroup.groupBy("event_type", "win")
      .agg(count(lit(1)).as("n_groups"), sum("n_g").as("n_rows"),
        max("z").as("max_z"),
        count(when(col("z") > TclosenessLambda, 1)).as("n_exposed"),
        sum(when(col("z") > TclosenessLambda, col("n_g")).otherwise(lit(0L)))
          .as("rows_exposed"))
    def pick(winVal: String, c: String) = max(when(col("win") === winVal, col(c)))
    perWin.groupBy("event_type").agg(
        coalesce(pick("ref", "n_groups"), lit(0L)).as("ref_groups"),
        coalesce(pick("cur", "n_groups"), lit(0L)).as("cur_groups"),
        coalesce(pick("ref", "n_rows"), lit(0L)).as("ref_rows"),
        coalesce(pick("cur", "n_rows"), lit(0L)).as("cur_rows"),
        coalesce(pick("ref", "n_exposed"), lit(0L)).as("ref_exposed_groups"),
        coalesce(pick("cur", "n_exposed"), lit(0L)).as("cur_exposed_groups"),
        coalesce(pick("ref", "rows_exposed"), lit(0L)).as("ref_rows_exposed"),
        coalesce(pick("cur", "rows_exposed"), lit(0L)).as("cur_rows_exposed"),
        pick("ref", "max_z").as("zr"), pick("cur", "max_z").as("zc"))
      .join(mids, "event_type")
      .select(col("event_type"), col("mid_day"),
        col("ref_groups"), col("cur_groups"),
        col("ref_rows"), col("cur_rows"),
        col("ref_exposed_groups"), col("cur_exposed_groups"),
        col("ref_rows_exposed"), col("cur_rows_exposed"),
        floorRound(col("zr"), 6).as("ref_max_z"),
        floorRound(col("zc"), 6).as("cur_max_z"),
        floorRound(col("zc") - col("zr"), 6).as("z_drift"),
        when(col("cur_rows_exposed").cast("decimal(19,0)") * col("ref_rows") >
          col("ref_rows_exposed").cast("decimal(19,0)") * col("cur_rows"), 1L)
          .otherwise(0L).as("exposure_drifted"))
      .orderBy("event_type")
  }

  val q173Sql: String = {
    import graft.functions.OracleRound.floorRoundSql
    s"""WITH e AS (
       |  SELECT $qidSqlExprs
       |  FROM events),
       |mids AS (
       |  SELECT event_type,
       |    CAST(floor((min(day_bucket) + max(day_bucket)) / 2.0) AS BIGINT)
       |      AS mid_day
       |  FROM e GROUP BY event_type),
       |g AS (
       |  SELECT e.event_type,
       |    CASE WHEN e.day_bucket <= m.mid_day THEN 'ref' ELSE 'cur' END AS win,
       |    e.day_bucket, e.value_band, count(*) AS c
       |  FROM e JOIN mids m ON e.event_type = m.event_type
       |  GROUP BY 1, 2, 3, 4),
       |grp AS (
       |  SELECT event_type, win, day_bucket, CAST(sum(c) AS BIGINT) AS n_g
       |  FROM g GROUP BY 1, 2, 3),
       |gb AS (
       |  SELECT event_type, win, value_band, CAST(sum(c) AS BIGINT) AS cg
       |  FROM g GROUP BY 1, 2, 3),
       |tot AS (
       |  SELECT event_type, win, CAST(sum(c) AS BIGINT) AS n,
       |    count(DISTINCT value_band) AS m
       |  FROM g GROUP BY 1, 2),
       |grid AS (
       |  SELECT gr.event_type, gr.win, gr.day_bucket, gl.value_band,
       |    gr.n_g, gl.cg, t.n, t.m, COALESCE(gc.c, 0) AS c
       |  FROM grp gr
       |  JOIN gb gl ON gr.event_type = gl.event_type AND gr.win = gl.win
       |  JOIN tot t ON gr.event_type = t.event_type AND gr.win = t.win
       |  LEFT JOIN g gc ON gc.event_type = gr.event_type AND gc.win = gr.win
       |    AND gc.day_bucket = gr.day_bucket
       |    AND gc.value_band = gl.value_band),
       |cum AS (
       |  SELECT event_type, win, day_bucket, n_g, n, m,
       |    sum(CAST(c AS DECIMAL(19,0)) * n - CAST(cg AS DECIMAL(19,0)) * n_g)
       |      OVER (PARTITION BY event_type, win, day_bucket ORDER BY value_band
       |            ROWS UNBOUNDED PRECEDING) AS cumd
       |  FROM grid),
       |pg AS (
       |  SELECT event_type, win, day_bucket, n_g,
       |    CASE WHEN m > 1 THEN
       |      CAST(sum(abs(cumd)) AS DOUBLE) / (CAST(m - 1 AS DOUBLE) * n_g * n)
       |    ELSE 0.0 END * sqrt(CAST(n_g AS DOUBLE)) AS z
       |  FROM cum GROUP BY event_type, win, day_bucket, n_g, n, m),
       |pw AS (
       |  SELECT event_type, win, count(*) AS n_groups,
       |    CAST(sum(n_g) AS BIGINT) AS n_rows,
       |    max(z) AS max_z,
       |    count(CASE WHEN z > $TclosenessLambda THEN 1 END) AS n_exposed,
       |    CAST(sum(CASE WHEN z > $TclosenessLambda THEN n_g ELSE 0 END)
       |      AS BIGINT) AS rows_exposed
       |  FROM pg GROUP BY event_type, win),
       |piv AS (
       |  SELECT event_type,
       |    CAST(coalesce(max(CASE WHEN win = 'ref' THEN n_groups END), 0) AS BIGINT) AS ref_groups,
       |    CAST(coalesce(max(CASE WHEN win = 'cur' THEN n_groups END), 0) AS BIGINT) AS cur_groups,
       |    CAST(coalesce(max(CASE WHEN win = 'ref' THEN n_rows END), 0) AS BIGINT) AS ref_rows,
       |    CAST(coalesce(max(CASE WHEN win = 'cur' THEN n_rows END), 0) AS BIGINT) AS cur_rows,
       |    CAST(coalesce(max(CASE WHEN win = 'ref' THEN n_exposed END), 0) AS BIGINT) AS ref_exposed_groups,
       |    CAST(coalesce(max(CASE WHEN win = 'cur' THEN n_exposed END), 0) AS BIGINT) AS cur_exposed_groups,
       |    CAST(coalesce(max(CASE WHEN win = 'ref' THEN rows_exposed END), 0) AS BIGINT) AS ref_rows_exposed,
       |    CAST(coalesce(max(CASE WHEN win = 'cur' THEN rows_exposed END), 0) AS BIGINT) AS cur_rows_exposed,
       |    max(CASE WHEN win = 'ref' THEN max_z END) AS zr,
       |    max(CASE WHEN win = 'cur' THEN max_z END) AS zc
       |  FROM pw GROUP BY event_type)
       |SELECT p.event_type, m.mid_day,
       |  ref_groups, cur_groups, ref_rows, cur_rows,
       |  ref_exposed_groups, cur_exposed_groups,
       |  ref_rows_exposed, cur_rows_exposed,
       |  ${floorRoundSql("zr", 6)} AS ref_max_z,
       |  ${floorRoundSql("zc", 6)} AS cur_max_z,
       |  ${floorRoundSql("zc - zr", 6)} AS z_drift,
       |  CAST(CASE WHEN CAST(cur_rows_exposed AS DECIMAL(19,0)) * ref_rows >
       |    CAST(ref_rows_exposed AS DECIMAL(19,0)) * cur_rows
       |    THEN 1 ELSE 0 END AS BIGINT) AS exposure_drifted
       |FROM piv p JOIN mids m ON p.event_type = m.event_type
       |ORDER BY p.event_type""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_kanonymity_audit" -> q153 _,
    "q155_ldiversity_audit" -> q155 _,
    "q170_tcloseness_audit" -> q170 _,
    "q173_tcloseness_drift" -> q173 _,
    "q119_ewma_telemetry" -> q119 _,
    "q120_attribution" -> q120 _,
    "q55_range_join" -> q55 _,
    "q17_hourly_windows" -> q17 _,
    "q18_sessionization" -> q18 _,
    "q19_json_extract" -> q19 _,
    "q20_asof_join" -> q20 _,
    "q60_session_window" -> q60 _)

  val oracles: Map[String, String] = Map(
    "q119_ewma_telemetry" -> q119Sql,
    "q120_attribution" -> q120Sql,
    "q55_range_join" -> q55Sql,
    "q17_hourly_windows" -> q17Sql,
    "q18_sessionization" -> q18Sql,
    "q19_json_extract" -> q19Sql,
    "q20_asof_join" -> q20Sql,
    "q60_session_window" -> q60Sql,
    "q153_kanonymity_audit" -> q153Sql,
    "q155_ldiversity_audit" -> q155Sql,
    "q170_tcloseness_audit" -> q170Sql,
    "q173_tcloseness_drift" -> q173Sql)
}
