package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.OracleRound.{floorRound, floorRoundSql, exactSum, exactSumSql}
import graft.sources.Tables

/** Training-data assembly operators — the third wave of LLM-pipeline
  * stages: turning a cleaned corpus into model-ready training input
  * (sequence packing, split assignment), corpus statistics that feed
  * curation decisions (PMI collocations, inverted index, interpolated
  * telemetry), storage-efficiency transforms (embedding quantization),
  * and the product-analytics surface a data team runs next to the
  * pipeline (funnel, unpivot).
  *
  * Tokenization stays `split(text, ' ')` — the single-sourced decision
  * shared with TextAnalysis/Corpus. Scale notes per query; the common
  * theme: windows are always PARTITIONED (never one global ordering),
  * vocabulary-sized tables broadcast, and iterative state (PageRank
  * ranks) is O(nodes), collected like MLlib collects k-means
  * centroids — never corpus-sized.
  */
object Training {

  /** Token budget per packed training sequence (q79). */
  private val PackBudget = 2048L

  /** q79 — sequence packing: assign documents to fixed-token-budget
    * packs (the step that turns variable-length documents into
    * context-window-sized training batches). Documents are packed in
    * deterministic doc_id order WITHIN each source shard:
    * pack = cumulative-tokens-before ÷ budget. The window is
    * partitioned by source — real pipelines pack per shard exactly so
    * this never degenerates into a single global ordering task; each
    * shard's packing is an independent sort + running sum. Integer
    * arithmetic throughout → engine-exact. */
  def q79(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before DIV $PackBudget"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"),
        floorRound(sum("n_tokens").cast("double") / PackBudget, 6).as("fill_ratio"))
      .orderBy("source", "pack_id")
  }

  val q79Sql: String =
    s"""WITH d AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM d)
       |SELECT source, CAST(cum_before // $PackBudget AS BIGINT) AS pack_id,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       |  ${floorRoundSql(s"CAST(sum(n_tokens) AS DOUBLE) / $PackBudget", 6)} AS fill_ratio
       |FROM c GROUP BY source, cum_before // $PackBudget
       |ORDER BY source, pack_id""".stripMargin

  /** q80 — deterministic train/val/test split assignment: every
    * document hashes into a split by md5 bucket (80/10/10), the same
    * engine-independent bucketing q50 samples with — re-running the
    * pipeline, on any engine, at any parallelism, assigns every
    * document to the same split (the property that keeps eval sets
    * stable across pipeline versions). One narrow projection + one
    * small aggregate; no data ever moves except the final 3-group
    * rollup. */
  def q80(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("split", expr(graft.functions.HashBucket.splitExpr("doc_id")))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        countDistinct("source").as("n_sources"))
      .orderBy("split")

  val q80Sql: String =
    s"""WITH d AS (SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    ${graft.functions.HashBucket.splitSql("doc_id")} AS split
      |  FROM documents)
      |SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  count(DISTINCT source) AS n_sources
      |FROM d GROUP BY 1 ORDER BY split""".stripMargin

  /** q81 — ordered funnel analysis over the event stream: of the
    * users who viewed, how many later clicked, and of those how many
    * later purchased (strict event-time ordering, the classic
    * conversion query). Each stage is a groupBy on user_id — all
    * three stages shuffle on the SAME key, so a cluster reuses one
    * co-partitioning end to end; stage outputs are user-sized, far
    * smaller than the event log, and only the final single-row rollup
    * leaves them. Timestamps are exact integer nanos → engine-exact
    * comparisons; the mean view→purchase latency divides as integer
    * DIV before presentation. */
  def q81(spark: SparkSession, sfDir: String): DataFrame = {
    // Four consumers (v, c, p, nAll) re-scan this 3-column projection
    // rather than persist it: A/B measured at sf0.1 (0.7 s vs 0.9 s
    // persisted) — a pruned columnar re-scan is cheaper than the
    // materialization barrier, unlike the shuffled/deduped
    // intermediates q27/q68 persist. The same trade holds at scale:
    // persisting a corpus-sized projection trades cheap scan I/O for
    // expensive cache storage.
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"), min("t_view").as("t_view"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"), min("t_view").as("t_view"))
    val nAll = ev.select(countDistinct("user_id").as("n_users"))
    val nV = v.select(count(lit(1)).as("n_viewed"))
    val nC = c.select(count(lit(1)).as("n_clicked"))
    val pAgg = p.select(count(lit(1)).as("n_purchased"),
      expr("sum(t_purchase - t_view) DIV count(1)").as("mean_lag_ns"))
    nAll.crossJoin(nV).crossJoin(nC).crossJoin(pAgg)
      .select(col("n_users"), col("n_viewed"), col("n_clicked"), col("n_purchased"),
        floorRound(col("n_clicked").cast("double") / col("n_viewed"), 6).as("view_to_click"),
        floorRound(col("n_purchased").cast("double") / col("n_clicked"), 6).as("click_to_buy"),
        col("mean_lag_ns"))
  }

  val q81Sql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
       |v AS (SELECT user_id, min(ts) AS t_view FROM ev
       |      WHERE event_type = 'view' GROUP BY user_id),
       |c AS (SELECT e.user_id, min(e.ts) AS t_click, min(v.t_view) AS t_view
       |      FROM ev e JOIN v ON e.user_id = v.user_id
       |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
       |p AS (SELECT e.user_id, min(e.ts) AS t_purchase, min(c.t_view) AS t_view
       |      FROM ev e JOIN c ON e.user_id = c.user_id
       |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
       |SELECT (SELECT count(DISTINCT user_id) FROM ev) AS n_users,
       |  (SELECT count(*) FROM v) AS n_viewed,
       |  (SELECT count(*) FROM c) AS n_clicked,
       |  (SELECT count(*) FROM p) AS n_purchased,
       |  ${floorRoundSql("CAST((SELECT count(*) FROM c) AS DOUBLE) / (SELECT count(*) FROM v)", 6)} AS view_to_click,
       |  ${floorRoundSql("CAST((SELECT count(*) FROM p) AS DOUBLE) / (SELECT count(*) FROM c)", 6)} AS click_to_buy,
       |  CAST((SELECT sum(t_purchase - t_view) // count(*) FROM p) AS BIGINT) AS mean_lag_ns""".stripMargin

  /** q82 — unpivot / melt (the inverse of q43's pivot): a wide
    * per-returnflag measures table melts into tidy
    * (key, measure, value) rows. Unpivot is a zero-shuffle Expand —
    * each input row emits one row per measure in place, so the op
    * costs one narrow pass no matter how wide the table; the only
    * shuffle here is the 3-group rollup that builds the wide input.
    * Measures are floor-rounded BEFORE melting so the long-format
    * doubles are engine-exact. */
  def q82(spark: SparkSession, sfDir: String): DataFrame = {
    val wide = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(floorRound(sum(col("l_quantity").cast("decimal(18,6)")).cast("double"), 2).as("sum_qty"),
        floorRound(sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double"), 2).as("sum_price"),
        count(lit(1)).cast("double").as("n_items"))
    wide.unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_items")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")
  }

  val q82Sql: String =
    s"""WITH wide AS (
       |  SELECT l_returnflag,
       |    ${floorRoundSql(exactSumSql("l_quantity"), 2)} AS sum_qty,
       |    ${floorRoundSql(exactSumSql("l_extendedprice"), 2)} AS sum_price,
       |    CAST(count(*) AS DOUBLE) AS n_items
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, measure, value
       |FROM (UNPIVOT wide ON sum_qty, sum_price, n_items
       |      INTO NAME measure VALUE value)
       |ORDER BY l_returnflag, measure""".stripMargin

  private val HourNs = 3600L * 1000 * 1000 * 1000

  /** q83 — time-series gap fill with linear interpolation: hourly
    * per-type event-value telemetry, where hours with no events are
    * reconstructed from their nearest observed neighbors (leading/
    * trailing gaps clamp to the nearest known value). The spine is
    * generated per key from its own [min,max] hour — never a global
    * calendar — and both gap-bridging passes are PARTITIONED windows
    * (one forward, one backward) over hour-sized rollups, so state
    * per key is O(hours), not O(events). Hourly sums aggregate in
    * DECIMAL; the interpolation weights are exact small-integer
    * ratios — the filled values are bit-identical cross-engine. */
  def q83(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr(s"ts DIV $HourNs").as("hour"))
      .agg(exactSum(col("value")).as("v"))
    val spine = hourly.groupBy("event_type")
      .agg(min("hour").as("mn"), max("hour").as("mx"))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("hour"))
    val wPrev = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(0, Window.unboundedFollowing)
    spine.join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("pv", last("v", ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when(col("v").isNotNull, col("hour")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first("v", ignoreNulls = true).over(wNext))
      .withColumn("nh", first(when(col("v").isNotNull, col("hour")), ignoreNulls = true).over(wNext))
      .select(col("event_type"), col("hour"), col("v").isNull.as("is_gap"),
        floorRound(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("hour") - col("ph")).cast("double") / (col("nh") - col("ph")))), 6)
          .as("value_filled"))
      .orderBy("event_type", "hour")
  }

  val q83Sql: String =
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_ns(ts) // $HourNs AS hour,
       |    ${exactSumSql("value")} AS v
       |  FROM events GROUP BY 1, 2),
       |spine AS (
       |  SELECT event_type, unnest(generate_series(min(hour), max(hour))) AS hour
       |  FROM hourly GROUP BY event_type),
       |j AS (
       |  SELECT s.event_type, s.hour, h.v,
       |    last_value(h.v IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.hour
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |    last_value(CASE WHEN h.v IS NOT NULL THEN s.hour END IGNORE NULLS)
       |      OVER (PARTITION BY s.event_type ORDER BY s.hour
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
       |    first_value(h.v IGNORE NULLS) OVER (PARTITION BY s.event_type ORDER BY s.hour
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       |    first_value(CASE WHEN h.v IS NOT NULL THEN s.hour END IGNORE NULLS)
       |      OVER (PARTITION BY s.event_type ORDER BY s.hour
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
       |  FROM spine s LEFT JOIN hourly h
       |    ON s.event_type = h.event_type AND s.hour = h.hour)
       |SELECT event_type, hour, v IS NULL AS is_gap,
       |  ${floorRoundSql(
            "CASE WHEN v IS NOT NULL THEN v WHEN pv IS NULL THEN nv " +
            "WHEN nv IS NULL THEN pv " +
            "ELSE pv + (nv - pv) * (CAST(hour - ph AS DOUBLE) / (nh - ph)) END", 6)} AS value_filled
       |FROM j ORDER BY event_type, hour""".stripMargin

  /** Minimum bigram count for q84 — PMI is noise below this. */
  private val PmiMinCount = 5L

  /** q84 — PMI bigram collocations: pointwise mutual information
    * ln(p(ab) / (p(a)·p(b))) over adjacent token pairs, the corpus
    * statistic behind tokenizer-merge candidates and stop-phrase
    * lists. Two corpus-sized aggregates (bigram + unigram counts,
    * both map-side combined); the unigram table is vocabulary-sized
    * so both probability joins BROADCAST — nothing corpus-sized ever
    * joins. Counts are exact longs; the PMI double is one identical
    * expression on both engines, floor-rounded BEFORE the global
    * top-50 rank so ordering is engine-independent. */
  def q84(spark: SparkSession, sfDir: String): DataFrame = {
    // Three consumers (unigrams, bigrams, bigram-count normalizer)
    // re-scan+tokenize rather than persist: A/B measured at sf0.1
    // (0.62 s vs 0.66 s persisted) — the scan+split is cheaper than
    // the materialization barrier (see q81's note; contrast with the
    // shuffled intermediates q27/q68 persist).
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val bi = toks
      // single-token docs MUST be excluded before the sequence:
      // sequence(1, 0) steps DOWNWARD to [1, 0] in Spark and the
      // lambda then evaluates element_at(t, 0), which always throws —
      // while DuckDB's generate_series(1, 0) is simply empty.
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= PmiMinCount)
    val nTok = uni.agg(sum("c").as("n")).select(col("n"))
    val nBi = toks.select((size(col("t")) - 1).cast("long").as("m"))
      .agg(sum("m").as("m"))
    bi.join(broadcast(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c", "c_a")), "w1")
      .join(broadcast(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c", "c_b")), "w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("c_ab"),
        floorRound(log(
          (col("c_ab").cast("double") * col("n") * col("n")) /
            (col("m").cast("double") * col("c_a") * col("c_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(50)
  }

  val q84Sql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |uni AS (SELECT unnest(t) AS tok FROM d),
       |u AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
       |bi AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
       |         i -> t[i] || ' ' || t[i + 1])) AS pair
       |       FROM d),
       |b AS (SELECT split_part(pair, ' ', 1) AS w1, split_part(pair, ' ', 2) AS w2,
       |        count(*) AS c_ab
       |      FROM bi GROUP BY 1, 2 HAVING count(*) >= $PmiMinCount),
       |n AS (SELECT sum(c) AS n FROM u),
       |m AS (SELECT sum(len(t) - 1) AS m FROM d)
       |SELECT b.w1, b.w2, b.c_ab,
       |  ${floorRoundSql(
            "ln((CAST(b.c_ab AS DOUBLE) * n.n * n.n) / (CAST(m.m AS DOUBLE) * ua.c * ub.c))", 6)} AS pmi
       |FROM b JOIN u ua ON b.w1 = ua.tok JOIN u ub ON b.w2 = ub.tok, n, m
       |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin

  /** Embedding dimensionality (fixture schema: 64 floats). */
  private val Dim = 64

  /** q85 — int8 scalar quantization of the embedding table with
    * reconstruction-error accounting: per-dimension [min,max] over
    * the corpus → 255-level uniform quantizer → per-label mean
    * squared reconstruction error. This is the 4×-storage-cut
    * applied before ANN indexes are built at scale. The stats table
    * is d rows (one aggregate, broadcast back); quantization is a
    * narrow map; the error rollup aggregates squared-error in
    * DECIMAL so partial-aggregation order can't move the result.
    * Floats widen to double exactly on both engines. */
  def q85(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      // Similarity's dimension contract: NULL/ragged vectors would
      // diverge posexplode (size rows) from the oracle's fixed
      // generate_series(1, Dim) expansion.
      .filter(size(col("embedding")) === Dim)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos0", "xf")))
      .select(col("vec_id"), col("label"), (col("pos0") + 1).as("pos"),
        col("xf").cast("double").as("x"))
    val stats = e.groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
    val q = e.join(broadcast(stats), "pos")
      .withColumn("scale", (col("mx") - col("mn")) / 255.0)
      .withColumn("q",
        when(col("scale") === 0.0, 0.0)
          .otherwise(least(lit(255.0), floor((col("x") - col("mn")) / col("scale") + 0.5))))
      .withColumn("recon", col("mn") + col("q") * col("scale"))
      .withColumn("sqerr", (col("x") - col("recon")) * (col("x") - col("recon")))
    q.groupBy("vec_id", "label")
      .agg(sum(col("sqerr").cast("decimal(28,18)")).cast("double").as("err"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        floorRound(sum(col("err").cast("decimal(28,18)")).cast("double") /
          count(lit(1)), 9).as("mse"))
      .orderBy("label")
  }

  val q85Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
       |  FROM embeddings, (SELECT unnest(generate_series(1, $Dim)) AS i) p
       |  WHERE len(embedding) = $Dim),
       |stats AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY pos),
       |q AS (
       |  SELECT e.vec_id, e.label, e.x, s.mn, (s.mx - s.mn) / 255.0 AS scale
       |  FROM e JOIN stats s ON e.pos = s.pos),
       |r AS (
       |  SELECT vec_id, label, x, mn, scale,
       |    CASE WHEN scale = 0.0 THEN 0.0
       |         ELSE least(255.0, floor((x - mn) / scale + 0.5)) END AS qv
       |  FROM q),
       |v AS (
       |  SELECT vec_id, label,
       |    CAST(sum(CAST((x - (mn + qv * scale)) * (x - (mn + qv * scale))
       |      AS DECIMAL(28,18))) AS DOUBLE) AS err
       |  FROM r GROUP BY vec_id, label)
       |SELECT label, count(*) AS n_vecs,
       |  ${floorRoundSql("CAST(sum(CAST(err AS DECIMAL(28,18))) AS DOUBLE) / count(*)", 9)} AS mse
       |FROM v GROUP BY label ORDER BY label""".stripMargin

  /** PageRank constants (q86): damping, node count (nations), rounds. */
  private val PrDamping = 0.85
  private val PrNodes = 25
  private val PrIters = 3

  /** Teleport base (1−d)/n, computed ONCE in Scala doubles and shared
    * bit-identically with the oracle (see the use site in [[q86]]). */
  private val PrBase: Double = (1.0 - PrDamping) / PrNodes

  /** q86 — weighted PageRank over the nation trade graph (customer
    * nation → supplier nation, edge weight = lineitem count), 3
    * synchronous iterations. The expensive part — deriving the edge
    * list from the fact tables — is ONE corpus-sized join+aggregate
    * pass producing a graph-sized (≤ n² rows) edge table; each
    * iteration is then an edges⋈ranks broadcast join + per-node
    * DECIMAL contribution sum, with only O(nodes) rank state pulled
    * to the driver per round — exactly how k-means (q77) moves
    * centroids, and how a 100 TB graph would keep rank state in the
    * small table position. Per-iteration ranks floor-round at 1e-12
    * so the trajectory is bit-identical to the unrolled-CTE oracle. */
  def q86(spark: SparkSession, sfDir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val edges = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = edges.groupBy("src").agg(sum("w").as("ow"))
    // The graph is ≤ n² rows after the one corpus-sized pass — cache
    // the weighted edge table ONCE, in one partition (it is tiny), so
    // each iteration is a single small job instead of re-deriving the
    // 4-way join; lineage truncated so the loop's plan stays O(1).
    val ew = edges.join(outw, "src").coalesce(1)
      .localCheckpoint(eager = true)
      .transform(graft.functions.CacheScope.registerCheckpoint)
    // ONE Scala-computed double is the teleport base on BOTH engines
    // (emitted into the oracle text as its round-trip literal):
    // leaving each engine to evaluate "(1.0 - 0.85) / 25" itself,
    // DuckDB does the subtraction in exact DECIMAL while doubles
    // carry 0.15000000000000002 — an ulp-level base divergence that
    // compounds through the iterations.
    val base = lit(PrBase)
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
      .coalesce(1).localCheckpoint(eager = true) // scanned every round otherwise
      .transform(graft.functions.CacheScope.registerCheckpoint)
    // Rank state is O(nodes): each round chains as a BROADCAST join
    // over the graph-sized edge table onto the previous round's plan —
    // all PrIters rounds schedule as ONE job (the per-round collect()
    // this replaces cost 3 driver round-trips + 3 job schedulings,
    // measured ~1.5 s of pure overhead at sf0.1). At a graph too big
    // for broadcast, ranks stay a distributed table co-partitioned
    // with edges on src and the same loop shuffle-joins instead.
    var ranks: DataFrame = (0 until PrNodes)
      .map(i => (i.toLong, 1.0 / PrNodes)).toDF("node", "r")
    for (_ <- 1 to PrIters) {
      val contrib = ew.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"), (col("r") * col("w") / col("ow")).as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib").cast("decimal(28,16)")).cast("double").as("c"))
      ranks = nodes
        .join(broadcast(contrib), col("node") === col("dst"), "left")
        .select(col("node"),
          floorRound(base + lit(PrDamping) * coalesce(col("c"), lit(0.0)), 12).as("r"))
    }
    ranks.withColumnRenamed("r", "rank")
      .join(broadcast(nodes), "node")
      .select(col("node"), col("n_name"), col("rank"))
      .orderBy(col("rank").desc, col("node"))
  }

  /** Unrolled-iteration twin of [[q86]] — generated from the same
    * (damping, nodes, iters) constants so the two can never drift. */
  val q86Sql: String = {
    val d = PrDamping
    // round-trip double literal, cast so DuckDB doesn't read it as
    // exact DECIMAL — must be the same bits Spark's lit(PrBase) carries
    val baseExpr = s"CAST($PrBase AS DOUBLE)"
    val iters = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT n.node, ${floorRoundSql(
                s"$baseExpr + $d * coalesce(s.c, 0.0)", 12)} AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum(CAST(p.r * e.w / e.ow AS DECIMAL(28,16))) AS DOUBLE) AS c
         |    FROM ew e JOIN r${i - 1} p ON p.node = e.src GROUP BY e.dst) s
         |  ON n.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |    CAST(s.s_nationkey AS BIGINT) AS dst, count(*) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |ow AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
       |ew AS (SELECT e.src, e.dst, e.w, o.ow FROM edges e JOIN ow o ON e.src = o.src),
       |nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS node, n_name FROM nation),
       |r0 AS (SELECT node, 1.0 / $PrNodes AS r FROM nodes),
       |$iters
       |SELECT n.node, n.n_name, r.r AS rank
       |FROM r$PrIters r JOIN nodes n ON r.node = n.node
       |ORDER BY rank DESC, n.node""".stripMargin
  }

  /** How many index terms q87 reports (ranked by document frequency). */
  private val IndexTopTerms = 100

  /** q87 — inverted-index construction: per-term document frequency,
    * collection frequency, and the head of its posting list (top-3
    * documents by term frequency). The posting-list build is one
    * (doc, term) aggregate — map-side combined, the same shape as
    * q71's tf — followed by ONE more per-term aggregate; the report
    * keeps the 100 highest-df terms. At index scale the posting
    * lists would sink partitioned by term instead of string-joining —
    * the aggregation shape is identical.
    *
    * The posting-list head is a bounded mergeable Aggregator
    * ([[graft.functions.TopKPostings]]), NOT a per-term rank window:
    * a window partitions by term and fully sorts each term's posting
    * list to keep 3 rows, so a hot stop-term ("the" = the whole
    * corpus in one partition) is a skew cliff at 100x. The Aggregator
    * keeps k rows in its buffer, aggregates partially map-side, and
    * ships at most k rows per term per map task — the hot term costs
    * the same as any other. */
  def q87(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val postingsHead = udaf(graft.functions.TopKPostings(3))
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        postingsHead(col("tf"), col("doc_id")).as("postings_head"))
      .orderBy(col("df").desc, col("term"))
      .limit(IndexTopTerms)
  }

  val q87Sql: String =
    s"""WITH tf AS (
       |  SELECT term, doc_id, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY term, doc_id),
       |rk AS (SELECT term, doc_id, tf,
       |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rk
       |  FROM tf)
       |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       |  string_agg(CASE WHEN rk <= 3 THEN CAST(doc_id AS VARCHAR) END, ','
       |    ORDER BY rk) AS postings_head
       |FROM rk GROUP BY term ORDER BY df DESC, term LIMIT $IndexTopTerms""".stripMargin

  /** q151 candidate context lengths — the sweep domain. */
  private val CtxLengths = Seq(64L, 128L, 256L, 512L, 1024L)

  /** q151 — context-length packing-efficiency sweep: for each
    * candidate context length L, chunk every document into
    * ceil(n_tokens/L) context windows and report the corpus cost of
    * choosing that L — total bins, padding tokens (bins·L − tokens),
    * utilization (tokens / bins·L), and how many documents need more
    * than one window. q79 packs at ONE budget; this is the knob-tuning
    * sweep run BEFORE q79, turning "pick a context length" into a
    * measured padding-waste-vs-fragmentation trade-off table.
    *
    * Scale shape: the ×|L| expansion is a codegen'd explode of a
    * 5-element literal array — no join, no second scan — feeding a
    * map-side-combined aggregate with |L| groups. Bin counts use
    * integer ceiling division ((nt + L − 1) div L; Spark `div` ≙
    * DuckDB `//`), so everything except the final utilization ratio
    * is integer-exact. */
  def q151(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("nt"))
      .select(col("nt"), explode(typedlit(CtxLengths)).as("ctx_len"))
      .withColumn("bins", expr("(nt + ctx_len - 1) div ctx_len"))
      .groupBy("ctx_len")
      .agg(count(lit(1)).as("n_docs"),
        sum("nt").as("n_tokens"),
        sum("bins").as("n_bins"),
        sum(col("bins") * col("ctx_len") - col("nt")).as("pad_tokens"),
        count(when(col("nt") > col("ctx_len"), 1)).as("n_multi_chunk"),
        floorRound(sum("nt").cast("double") /
          (sum("bins") * first(col("ctx_len"))).cast("double"), 6)
          .as("utilization"))
      .orderBy("ctx_len")

  val q151Sql: String =
    s"""WITH d AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
       |  FROM documents),
       |g AS (
       |  SELECT nt, l.ctx_len, (nt + l.ctx_len - 1) // l.ctx_len AS bins
       |  FROM d, (SELECT unnest([${CtxLengths.mkString(", ")}]) AS ctx_len) l)
       |SELECT ctx_len, count(*) AS n_docs,
       |  CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  CAST(sum(bins) AS BIGINT) AS n_bins,
       |  CAST(sum(bins * ctx_len - nt) AS BIGINT) AS pad_tokens,
       |  CAST(count(CASE WHEN nt > ctx_len THEN 1 END) AS BIGINT)
       |    AS n_multi_chunk,
       |  ${floorRoundSql(
            "CAST(sum(nt) AS DOUBLE) / CAST(sum(bins) * ctx_len AS DOUBLE)", 6)}
       |    AS utilization
       |FROM g GROUP BY ctx_len ORDER BY ctx_len""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_sequence_packing" -> q79 _,
    "q80_split_assignment" -> q80 _,
    "q81_funnel" -> q81 _,
    "q82_unpivot" -> q82 _,
    "q83_interpolate" -> q83 _,
    "q84_pmi_collocations" -> q84 _,
    "q85_quantize_embeddings" -> q85 _,
    "q86_pagerank_nations" -> q86 _,
    "q87_inverted_index" -> q87 _,
    "q151_ctx_length_sweep" -> q151 _)

  val oracles: Map[String, String] = Map(
    "q79_sequence_packing" -> q79Sql,
    "q80_split_assignment" -> q80Sql,
    "q81_funnel" -> q81Sql,
    "q82_unpivot" -> q82Sql,
    "q83_interpolate" -> q83Sql,
    "q84_pmi_collocations" -> q84Sql,
    "q85_quantize_embeddings" -> q85Sql,
    "q86_pagerank_nations" -> q86Sql,
    "q87_inverted_index" -> q87Sql,
    "q151_ctx_length_sweep" -> q151Sql)
}
