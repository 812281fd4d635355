package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Streaming twins produce the same aggregates as the batch queries
  * when fed the same (finite) data. Update mode is used so that with a
  * single micro-batch every group is emitted exactly once (append mode
  * withholds windows still ahead of the watermark; session windows
  * support complete, not update) — the semantic-equivalence check
  * that lets the batch oracle vouch for the streaming path. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  /** Materialize sf0.001 events as JSON files a file stream can read
    * - ONE fixture writer for every test so the ts truncation and
    * schema cannot silently diverge between suites' inputs. */
  def writeEventsJson(parts: Int, prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .repartition(parts)
      .write.mode("overwrite").json(dir + "/in")
    dir + "/in"
  }

  lazy val streamDir: String = writeEventsJson(1, "graft_stream")

  test("streaming hourly counts match the batch q17 aggregation") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.hourlyCounts(stream), "hourly_out", outputMode = "update")
    try {
      val got = spark.table("hourly_out")
        .select(col("window_start"), col("event_type"), col("n_events"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
        .toSet
      val want = SparkEntry.queries("q17_hourly_windows")(spark, "/root/testdata/sf0.001")
        .select((col("hour_bucket") * 3600L * 1000).as("ms"), col("event_type"),
          col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got === want)
    } finally q.stop()
  }

  test("mapGroupsWithState user totals match the batch groupBy") {
    import graft.streaming.{Ev, StatefulOps}
    import graft.streaming.StatefulOps.evEnc
    val stream = EventStreams.readEventStream(spark, streamDir).as[Ev]
    val q = EventStreams.runToMemory(
      StatefulOps.userTotals(stream).toDF(), "totals_out", outputMode = "update")
    try {
      val got = spark.table("totals_out")
        .collect().map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100))))
        .toMap
      val want = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100))))
        .toMap
      assert(got === want)
    } finally q.stop()
  }

  test("streaming running moments are BIT-identical to the batch decimal aggregate") {
    import graft.streaming.{Ev, StatefulOps}
    import graft.streaming.StatefulOps.evEnc
    val stream = EventStreams.readEventStream(spark, streamDir).as[Ev]
    val q = EventStreams.runToMemory(
      StatefulOps.momentsStream(stream).toDF(), "moments_out", outputMode = "update")
    try {
      val got = spark.table("moments_out")
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2).stripTrailingZeros, r.getDecimal(3).stripTrailingZeros))
        .toMap
      val want = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .withColumn("v", (col("value")).cast("decimal(18,6)"))
        .withColumn("v2", (col("value") * col("value")).cast("decimal(27,12)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v").as("s1"), sum("v2").as("s2"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2).stripTrailingZeros, r.getDecimal(3).stripTrailingZeros))
        .toMap
      assert(got === want, "streaming decimal moments drifted from batch — not exact")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessions = batch q18 sessions minus each user's open tail") {
    import graft.streaming.{Ev, StatefulOps}
    import graft.streaming.StatefulOps.evEnc
    val stream = EventStreams.readEventStream(spark, streamDir).as[Ev]
    val q = EventStreams.runToMemory(
      StatefulOps.sessionsCustom(stream).toDF(), "custom_sessions", outputMode = "append")
    try {
      val got = spark.table("custom_sessions")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch truth: all sessions except each user's last (still open in state)
      val batch = SparkEntry.queries("q18_sessionization")(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
          r.getAs[Long]("start_ns") / 1000000L, r.getAs[Long]("end_ns") / 1000000L,
          r.getAs[Long]("n_events")))
      val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val want = batch.filter(s => s._2 != lastPerUser(s._1))
        .map(s => (s._1, s._3, s._4, s._5)).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("streaming watermarked dropDuplicates collapses duplicated input to the batch distinct") {
    // Land every event TWICE (two JSON files), then dedup on event_id
    // with a watermark (EventStreams.dedupStream — GC-able state).
    // The streamed result must equal the batch table exactly: one row
    // per event_id, none lost.
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString + "/in"
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    ev.coalesce(1).write.mode("overwrite").json(dir)
    ev.coalesce(1).write.mode("append").json(dir)
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.runToMemory(
      EventStreams.dedupStream(stream), "dedup_out", outputMode = "append")
    try {
      val got = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      val want = ev.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === want)
    } finally q.stop()
  }

  test("checkpointed parquet sink is exactly-once across restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val out = base + "/out"
    val ckpt = base + "/ckpt"
    def runOnce(): Unit = {
      val q = EventStreams.runToParquet(
        EventStreams.readEventStream(spark, streamDir)
          .select("event_id", "user_id", "event_type", "value"),
        out, ckpt)
      q.stop()
    }
    runOnce()
    val n1 = spark.read.parquet(out).count()
    val distinct1 = spark.read.parquet(out).select("event_id").distinct().count()
    assert(n1 === 1000 && distinct1 === 1000)
    // restart with the same checkpoint: offsets already committed, so
    // nothing is re-delivered and the sink stays exactly-once
    runOnce()
    assert(spark.read.parquet(out).count() === n1)
  }

  test("stream-stream interval join matches the batch range join") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.viewPurchaseJoin(stream), "vp_join", outputMode = "append")
    try {
      val got = spark.table("vp_join")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      val want = purchases.join(views,
          col("p_user") === col("v_user") &&
            col("v_ts") <= col("p_ts") && col("v_ts") >= col("p_ts") - gapNs)
        .select("purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("batch banded range join (q55) equals the streaming interval join") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.viewPurchaseJoin(stream), "vp_join_q55", outputMode = "append")
    try {
      val streaming = spark.table("vp_join_q55")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = SparkEntry.queries("q55_range_join")(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === streaming)
    } finally q.stop()
  }

  test("streaming session_window agrees with batch q18 on session count per user") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.sessions(stream), "sessions_out", outputMode = "complete")
    try {
      val got = spark.table("sessions_out")
        .groupBy("user_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = SparkEntry.queries("q18_sessionization")(spark, "/root/testdata/sf0.001")
        .groupBy("user_id").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === want)
    } finally q.stop()
  }

  test("streaming chunk dedup (q117 twin) reproduces the batch first-occurrence kept-set across micro-batches") {
    import graft.streaming.CorpusStreams
    // Replay the corpus in doc_id order as TWO files read one per
    // trigger (the second written after a beat so the file source's
    // modification-time ordering is unambiguous): cross-batch state
    // must drop batch-2 copies of sigs first seen in batch 1. Event
    // times ascend with doc_id and span far less than the watermark
    // delay, so no state times out mid-replay.
    val dir = java.nio.file.Files.createTempDirectory("graft_chunkdedup").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"), col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100) // distinct mtime even on 1s-granularity filesystems
    docs.filter(col("doc_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = CorpusStreams.readDocStream(spark, dir, maxFilesPerTrigger = 1)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.chunkDedupStream(stream).toDF(), "chunk_dedup_out",
      outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2,
        s"expected >=2 micro-batches, got ${q.recentProgress.length} — cross-batch path not exercised")
      val rows = spark.table("chunk_dedup_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val got = rows.toSet
      // a sig must be ADMITTED once, not once per micro-batch — a
      // re-emission bug with an identical keeper row would vanish in
      // the Set compare, so pin no-duplicates explicitly
      assert(rows.length === got.size,
        s"${rows.length - got.size} duplicate emissions — first-occurrence contract broken")
      // batch truth: q117's keeper aggregate over the same corpus
      val want = graft.operators.Corpus
        .chunkSigs(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
        .groupBy("sig")
        .agg(min(struct(col("doc_id"), col("chunk_id"))).as("k"))
        .select(col("sig"), col("k.doc_id"), col("k.chunk_id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, "streaming kept-set diverged from the batch first-occurrence set")
    } finally q.stop()
  }

  test("streaming normalized dedup (q139 twin): kept-set ≡ batch keepers, dups dropped across batches") {
    import graft.streaming.CorpusStreams
    // Local fixture with canonically-equal pairs STRADDLING the batch
    // boundary (the clean corpus has no normalized dups): docs 3/7 in
    // batch 2 are case/space/punct mangles of docs 1/2 from batch 1 —
    // cross-batch state must drop them; doc 6 duplicates doc 5 within
    // batch 2 (within-batch keeper order must pick 5).
    val base = java.nio.file.Files.createTempDirectory("graft_normdedup").toString
    val dir = base + "/in"
    import spark.implicits._
    def ts(i: Long) = new java.sql.Timestamp(1700000000000L + i * 1000)
    Seq((1L, ts(1), "Hello, World foo"), (2L, ts(2), "alpha beta"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    Seq((3L, ts(3), "  hello world FOO !"), (5L, ts(5), "gamma delta"),
      (6L, ts(6), "GAMMA delta."), (7L, ts(7), "ALPHA beta"))
      .toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").json(dir)
    val stream = CorpusStreams.readDocStream(spark, dir, maxFilesPerTrigger = 1)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.normalizedDedupStream(stream).toDF(), "norm_dedup_out",
      outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("norm_dedup_out").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(rows.length === rows.toSet.size, "duplicate emissions")
      val got = rows.toMap
      assert(got.values.toSet === Set(1L, 2L, 5L), s"keepers: $got")
      // Batch truth over the same docs through the SHARED normSig.
      val want = Seq((1L, "Hello, World foo"), (2L, "alpha beta"),
        (3L, "  hello world FOO !"), (5L, "gamma delta"),
        (6L, "GAMMA delta."), (7L, "ALPHA beta"))
        .toDF("doc_id", "text")
        .groupBy(graft.operators.Dedup.normSig(col("text")).as("sig"))
        .agg(min("doc_id").as("keeper"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === want, "streaming kept-set diverged from the batch q139 keepers")
    } finally q.stop()
  }

  test("streaming delta dedup (q152 twin): all three classes correct across a batch-straddling replay") {
    import graft.streaming.CorpusStreams
    import spark.implicits._
    // Base index: two known documents A and B. The stream replays a
    // delta batch with every classification path exercised: base hits
    // in both micro-batches (8, 27), a novel→dup_delta pair STRADDLING
    // the batch boundary (16→19, cross-batch state), a novel→dup_delta
    // pair WITHIN one batch (31→60, within-batch min-doc keeper), and
    // an independent novel pair straddling (43→59).
    val A = "alpha beta gamma"; val B = "delta epsilon zeta"
    val C = "eta theta iota"; val D = "kappa lambda mu"; val E = "nu xi omicron"
    val baseSigs = Seq(A, B).toDF("text").select(md5(col("text")).as("sig"))
    val dir = java.nio.file.Files.createTempDirectory("graft_deltadedup").toString + "/in"
    def ts(i: Long) = new java.sql.Timestamp(1700000000000L + i * 1000)
    Seq((8L, ts(8), "srcX", A), (16L, ts(16), "srcX", C), (43L, ts(43), "srcY", D))
      .toDF("doc_id", "ts", "source", "text").coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    Seq((19L, ts(19), "srcX", C), (27L, ts(27), "srcY", B),
      (31L, ts(31), "srcY", E), (59L, ts(59), "srcY", D), (60L, ts(60), "srcY", E))
      .toDF("doc_id", "ts", "source", "text").coalesce(1).write.mode("append").json(dir)
    val stream = spark.readStream.schema(CorpusStreams.sourcedDocSchema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.deltaDedupStream(stream, baseSigs).toDF(), "delta_dedup_out",
      outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("delta_dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(3)))
      assert(rows.length === rows.toSet.size, "duplicate emissions")
      // exactly one classification per arriving document
      assert(rows.map(_._1).sorted.toSeq === Seq(8L, 16L, 19L, 27L, 31L, 43L, 59L, 60L),
        s"per-doc emission coverage: ${rows.toSeq}")
      val got = rows.toMap
      val want = Map(8L -> "dup_base", 27L -> "dup_base",
        16L -> "novel", 43L -> "novel", 31L -> "novel",
        19L -> "dup_delta", 59L -> "dup_delta", 60L -> "dup_delta")
      assert(got === want, "stream classification diverged from the batch q152 rule")
    } finally q.stop()
  }

  test("streaming LSH near-dup (q37 twin): stream pair-set ≡ batch pairs over a 2-batch replay") {
    import graft.streaming.VectorStreams
    // Replay the sf0.001 embedding corpus (500 vectors, 56 true
    // near-dup pairs) in vec_id order as TWO micro-batches: pairs
    // whose members straddle the batch boundary must be found via
    // bucket STATE (the earlier member survives in its band buckets
    // until the watermark passes), pinning the cross-batch path. The
    // delay (1 h) far exceeds the replay's 500 s event-time span, so
    // nothing GCs mid-replay and the stream's detect-within-window
    // guarantee covers every batch pair — making exact set parity
    // with q37 the correct oracle, not an approximation.
    val dir = java.nio.file.Files.createTempDirectory("graft_lshstream").toString + "/in"
    val vecs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        timestamp_seconds(lit(1700000000L) + col("vec_id")).as("ts"),
        col("embedding").cast("array<double>").as("embedding"))
    val mid = 250L
    vecs.filter(col("vec_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    vecs.filter(col("vec_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = spark.readStream.schema(VectorStreams.vecSchema)
      .option("maxFilesPerTrigger", 1).json(dir)
    // Frozen trained centroids — the cell-scoped twin's offline
    // model, identical to the batch ivf-assign family's.
    val cents = graft.operators.Similarity.trainedCentroids(
      spark, "/root/testdata/sf0.001")
    val q = EventStreams.runToMemory(
      VectorStreams.nearDupPairStream(stream, cents,
        delayMs = 3600L * 1000).toDF(),
      "lsh_neardup_out", outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2,
        s"expected >=2 micro-batches, got ${q.recentProgress.length} — cross-batch path not exercised")
      val got = spark.table("lsh_neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = SparkEntry.queries("q37_srp_lsh_neardup")(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // cell-scoped truth is smaller than the former global banding's
      // 56 pairs (only co-cell pairs are candidates) but must stay
      // non-degenerate for the parity check to mean anything
      assert(want.size > 10, s"degenerate batch truth: ${want.size} pairs")
      assert(got === want,
        s"stream pair-set diverged from batch: missing ${want -- got}, extra ${got -- want}")
    } finally q.stop()
  }

  test("streaming ANN maintenance (q168 twin): live cell drift ≡ batch over a 2-batch replay") {
    import graft.streaming.VectorStreams
    import org.apache.spark.sql.types._
    val sf001 = "/root/testdata/sf0.001"
    // The arriving 20% replayed as TWO micro-batches against the
    // FROZEN base-trained centroids; the complete-mode table after
    // the replay must equal batch q168's arriving-side columns —
    // same assignment expression, same integer drift rule, so exact
    // row parity, not an approximation.
    val arriving = graft.operators.Similarity.vecs(spark, sf001)
      .filter(col("vec_id") % 10 >= 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_annmaint").toString + "/in"
    arriving.filter(col("vec_id") % 10 === 8).coalesce(1)
      .write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    arriving.filter(col("vec_id") % 10 === 9).coalesce(1)
      .write.mode("append").json(dir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val cents = graft.operators.Similarity.maintCentroids(spark, sf001)
    val hist = graft.operators.Similarity.maintBaseHistogram(spark, sf001)
    val q = EventStreams.runToMemory(
      VectorStreams.annMaintenanceStream(stream, cents, hist).toDF(),
      "annmaint_out", outputMode = "complete")
    try {
      assert(q.recentProgress.length >= 2,
        s"expected >=2 micro-batches, got ${q.recentProgress.length}")
      val got = spark.table("annmaint_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = SparkEntry.queries("q168_ann_maintenance")(spark, sf001)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSet
      assert(want.nonEmpty && want.exists(_._4 == 0L),
        s"degenerate batch truth: $want")
      assert(got === want,
        s"live drift table diverged from batch: missing ${want -- got}, extra ${got -- want}")
    } finally q.stop()
  }

  test("streaming cross-modal retrieval (q166 twin): stream hits ≡ batch rows over a 2-batch replay") {
    import graft.streaming.VectorStreams
    import org.apache.spark.sql.types._
    // Replay the 10 probe documents as TWO micro-batches against the
    // STATIC embedding corpus (the online-retrieval topology: index
    // static, queries streaming). Every probe's corpus rows
    // materialize inside its own micro-batch (stream-static join), so
    // exact row parity with batch q166 — same tower, same native
    // cosine, same (cos DESC, vec_id ASC) tie-break, same floor-6 —
    // is the correct oracle, not an approximation.
    val dir = java.nio.file.Files.createTempDirectory("graft_xmodal").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 10).select(col("doc_id"), col("text"))
    docs.filter(col("doc_id") < 5).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= 5).coalesce(1).write.mode("append").json(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val corpus = graft.operators.Similarity.cvecs(spark, "/root/testdata/sf0.001")
    val q = EventStreams.runToMemory(
      VectorStreams.crossModalTopKStream(stream, corpus).toDF(),
      "xmodal_out", outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2,
        s"expected >=2 micro-batches, got ${q.recentProgress.length}")
      val got = spark.table("xmodal_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val want = SparkEntry.queries("q166_crossmodal_knn")(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(want.size === 50, s"degenerate batch truth: ${want.size} rows")
      assert(got === want,
        s"stream hits diverged from batch: missing ${want -- got}, extra ${got -- want}")
    } finally q.stop()
  }

  test("streaming MinHash near-dup candidates (q22 twin): stream pair-set ≡ batch candidates over a 2-batch replay") {
    import graft.streaming.CorpusStreams
    // Replay the document corpus in doc_id order as TWO micro-batches:
    // candidate pairs whose members straddle the boundary must be
    // found via bucket STATE (the earlier member survives in its band
    // buckets until the watermark passes). The 1 h delay far exceeds
    // the replay's event-time span, so nothing GCs mid-replay and the
    // stream's detect-within-window guarantee covers every batch pair
    // — exact set parity with q22 is the correct oracle.
    val dir = java.nio.file.Files.createTempDirectory("graft_mhstream").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"), col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = CorpusStreams.readDocStream(spark, dir, maxFilesPerTrigger = 1)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.minhashCandidateStream(stream, delayMs = 3600L * 1000).toDF(),
      "mh_cand_out", outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2,
        s"expected >=2 micro-batches, got ${q.recentProgress.length} — cross-batch path not exercised")
      val got = spark.table("mh_cand_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = SparkEntry.queries("q22_minhash_lsh")(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty, "degenerate batch truth: no candidate pairs")
      // at least one pair must straddle the batch boundary, or the
      // cross-batch state path wasn't really exercised
      assert(want.exists(p => p._1 < mid && p._2 >= mid),
        "no boundary-straddling candidate pair in the fixture")
      assert(got === want,
        s"stream candidate set diverged from batch: missing ${want -- got}, extra ${got -- want}")
    } finally q.stop()
  }

  test("streaming mixture rebalance (q127 twin): stream-admitted set ≡ batch kept set, any batching") {
    import graft.streaming.CorpusStreams
    // Calibrate offline on the full batch corpus, enforce online over
    // a 2-micro-batch replay: the admitted doc set must equal the
    // batch filter EXACTLY — the md5 keep test is stateless, so
    // micro-batch boundaries cannot change decisions by construction,
    // and this pins that the stream path consumes the SAME rate table
    // and hash expression (a drifted rate formula or hash string
    // fails here).
    val batchDocs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val rates = graft.operators.Corpus.mixtureRates(batchDocs)
    val dir = java.nio.file.Files.createTempDirectory("graft_rebal").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("source"), col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    // Batch 2 also carries a document from a source UNKNOWN to the
    // calibration table (a crawl onboarded mid-stream): the admit
    // policy must let it through at rate 1.0, not drop it silently.
    docs.filter(col("doc_id") >= mid)
      .unionByName(spark.range(1).select(
        lit(999999L).as("doc_id"),
        timestamp_seconds(lit(1700000999L)).as("ts"),
        lit("src_new_crawl").as("source"),
        lit("fresh onboarded text").as("text")))
      .coalesce(1).write.mode("append").json(dir)
    val stream = spark.readStream.schema(CorpusStreams.sourcedDocSchema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.rebalanceStream(stream, rates), "rebalance_out",
      outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2,
        s"expected >=2 micro-batches, got ${q.recentProgress.length}")
      val got = spark.table("rebalance_out").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got.contains((999999L, "src_new_crawl")),
        "unknown-source document must be admitted at rate 1.0, not dropped")
      val want = batchDocs
        .join(broadcast(rates.select(col("source"), col("keep_rate"))), Seq("source"))
        .filter(graft.operators.Corpus.keepTest)
        .select(col("doc_id"), col("source")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet + ((999999L, "src_new_crawl"))
      assert(got === want, "stream-admitted set diverged from the batch kept set")
      // non-degenerate: something admitted, something dropped
      assert(got.nonEmpty && got.size < 500, s"degenerate admit count ${got.size}")
    } finally q.stop()
  }

  test("streaming BPE encode (q169 twin): running per-source stats ≡ batch encode after a 2-batch replay") {
    import graft.streaming.CorpusStreams
    // Train offline once (the shared trained-model memo), serve the
    // corpus online as two micro-batches; the final running stats per
    // source must equal batch q169 row-for-row — sums/max are exact
    // integers, so the derived ratios are bit-equal too.
    val sfd = "/root/testdata/sf0.001"
    val merges = graft.operators.TextAnalysis.trainedMerges(spark, sfd)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpestream").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, sfd)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("source"), col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = spark.readStream.schema(CorpusStreams.sourcedDocSchema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.bpeEncodeStream(stream, merges), "bpe_encode_out",
      outputMode = "update")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("bpe_encode_out").collect()
      val finals = rows.zipWithIndex.groupBy(_._1.getString(0))
        .map { case (s, rs) => s -> rs.maxBy(_._2)._1.toString }
      val want = SparkEntry.queries("q169_bpe_encode")(spark, sfd).collect()
        .map(r => r.getString(0) -> r.toString).toMap
      assert(finals.keySet === want.keySet, "source coverage diverges")
      finals.foreach { case (s, got) =>
        assert(got === want(s), s"source $s: stream $got vs batch ${want(s)}")
      }
      assert(rows.length > finals.size, "no intermediate emissions seen")
      graft.functions.CacheScope.drain()
    } finally q.stop()
  }

  test("streaming count-min sketch (q174 twin): final cells ≡ independent md5 replay; estimates ≡ batch for every gram") {
    import graft.streaming.CorpusStreams
    val sfd = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_cmstream").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, sfd)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = spark.readStream.schema(CorpusStreams.docSchema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = EventStreams.runToMemory(
      CorpusStreams.countMinStream(stream), "cm_out", outputMode = "update")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("cm_out").collect()
      // update mode re-emits a cell whenever it changes — the final
      // state per cell is its LAST emission.
      val finalCells = rows.zipWithIndex
        .groupBy(r => (r._1.getInt(0), r._1.getLong(1)))
        .map { case (k, rs) => k -> rs.maxBy(_._2)._1.getLong(2) }
      // Independent reference: pure-Scala md5 replay of the sketch —
      // neither the batch nor the stream engine path vouches for it.
      val md = java.security.MessageDigest.getInstance("MD5")
      def bucket(gram: String, r: Int): Long = {
        val hex = md.digest(s"$gram:$r".getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex, 16) % graft.operators.TextAnalysis.CmWidth
      }
      val want = scala.collection.mutable.Map.empty[(Int, Long), Long]
      val vocab = scala.collection.mutable.Map.empty[String, Long]
      // Same isNotNull filter as the stream input — the reference must
      // replay exactly the rows the stream saw.
      graft.sources.Tables.documents(spark, sfd)
        .filter(col("text").isNotNull)
        .select(col("text")).collect().foreach { row =>
          val t = row.getString(0).split(" ", -1)
          var i = 0
          while (i < t.length - 1) {
            val g = t(i) + " " + t(i + 1)
            vocab.update(g, vocab.getOrElse(g, 0L) + 1L)
            var r = 0
            while (r < graft.operators.TextAnalysis.CmRows) {
              val k = (r, bucket(g, r))
              want.update(k, want.getOrElse(k, 0L) + 1L); r += 1
            }
            i += 1
          }
        }
      assert(finalCells === want.toMap,
        "stream cells diverge from the independent md5 replay")
      // Point-estimate parity: min-over-rows reads of the streamed
      // state must equal batch cmEstimates for EVERY gram.
      val batchEst = graft.operators.TextAnalysis.cmEstimates(spark, sfd)
        .collect().map(r => r.getAs[String]("gram") -> r.getAs[Long]("est")).toMap
      vocab.keys.foreach { g =>
        val streamEst = (0 until graft.operators.TextAnalysis.CmRows)
          .map(r => finalCells((r, bucket(g, r)))).min
        assert(streamEst === batchEst(g), s"gram '$g': stream est $streamEst vs batch ${batchEst(g)}")
      }
    } finally q.stop()
  }

  test("streaming KMV sketch (q178 twin): final per-source sketches ≡ batch over a 2-batch replay") {
    import graft.streaming.CorpusStreams
    val sfd = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_kmvstream").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, sfd)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
        col("source"), col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = spark.readStream.schema(CorpusStreams.sourcedDocSchema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = EventStreams.runToMemory(
      CorpusStreams.kmvStream(stream), "kmv_out", outputMode = "update")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("kmv_out").collect()
      // update mode re-emits a source whenever its sketch changes —
      // the final state per source is its LAST emission.
      val finals = rows.zipWithIndex.groupBy(_._1.getString(0))
        .map { case (s, rs) =>
          s -> rs.maxBy(_._2)._1.getSeq[org.apache.spark.sql.Row](1)
            .map(e => (e.getLong(0), e.getString(1))).toSeq
        }
      val want = graft.operators.TextAnalysis
        .kmvSketches(graft.sources.Tables.documents(spark, sfd)
          .filter(col("text").isNotNull)).collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getLong(0), e.getString(1))).toSeq)
        .toMap
      assert(finals.keySet === want.keySet, "source coverage diverges")
      finals.foreach { case (s, got) =>
        assert(got === want(s), s"source $s: stream sketch diverges from batch")
      }
      assert(rows.length > finals.size, "no intermediate emissions seen")
    } finally q.stop()
  }

  test("streaming decontamination (q68 twin): per-doc flags and counts ≡ batch over a 2-batch replay") {
    import graft.streaming.CorpusStreams
    // Calibrate offline (the src0 benchmark shingle set — exactly
    // q68's), enforce online over the non-benchmark corpus replayed
    // as two micro-batches. The filter is stateless, so batching
    // cannot change any decision; parity must hold row-for-row on
    // (n_sh, n_hit, ratio), not just on the flagged set.
    val sfd = "/root/testdata/sf0.001"
    val bench = graft.operators.TextAnalysis.benchShingles(spark, sfd)
    val dir = java.nio.file.Files.createTempDirectory("graft_decontam").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, sfd)
      .filter(col("source") =!= "src0")
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"), col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = CorpusStreams.readDocStream(spark, dir, maxFilesPerTrigger = 1)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.decontamStream(stream, bench), "decontam_out",
      outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("decontam_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      assert(rows.length === rows.map(_._1).distinct.length, "duplicate emissions")
      val flagged = rows.filter(_._5).map(r => (r._1, r._2, r._3, r._4)).toSet
      val want = SparkEntry.queries("q68_decontamination")(spark, sfd).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(want.nonEmpty, "degenerate batch truth: no contaminated docs")
      assert(flagged === want,
        s"flags diverged: missing ${want -- flagged}, extra ${flagged -- want}")
      // Non-degenerate both ways: the stream also scored clean docs.
      assert(rows.length > flagged.size, "no clean documents scored")
    } finally q.stop()
  }

  test("streaming length-drift monitor (q142 twin): final emissions ≡ batch KS rows after a 2-batch replay") {
    import graft.streaming.CorpusStreams
    // Calibrate the reference ECDF offline on the full corpus, then
    // replay that SAME corpus as two micro-batches: each source's
    // LAST emission (max n_docs — the monitor re-emits per trigger)
    // must reproduce q142's (n_docs, ks_stat, at_len) row exactly,
    // pinning the integer-numerator sup, the tie-break, and the
    // cross-batch histogram state in one shot. Mid-replay emissions
    // additionally prove the monitor reports DRIFT while only half
    // the stream has arrived (a half-corpus ECDF differs from the
    // full reference for at least one source).
    val sfd = "/root/testdata/sf0.001"
    val batchDocs = graft.sources.Tables.documents(spark, sfd)
    val (ref, nAll) = CorpusStreams.lengthReference(batchDocs)
    val dir = java.nio.file.Files.createTempDirectory("graft_ksdrift").toString + "/in"
    val docs = batchDocs.select(col("doc_id"),
      timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"),
      col("source"), col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = spark.readStream.schema(CorpusStreams.sourcedDocSchema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.lengthDriftStream(stream, ref, nAll).toDF(), "ksdrift_out",
      outputMode = "update")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("ksdrift_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      val finals = rows.groupBy(_._1).map { case (s, rs) => s -> rs.maxBy(_._2) }
      val want = SparkEntry.queries("q142_length_ks_drift")(spark, sfd).collect()
        .map(r => (r.getString(0), (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
      assert(finals.keySet === want.keySet, "source coverage diverges")
      finals.foreach { case (s, got) =>
        assert(got === want(s), s"source $s: stream $got vs batch ${want(s)}")
      }
      // Some source emitted an INTERMEDIATE row (n_docs below final):
      // the per-trigger re-emission path is real, not a single flush.
      assert(rows.length > finals.size, "no intermediate emissions seen")
    } finally q.stop()
  }

  test("streaming anonymity monitor (q153 twin): final emissions ≡ batch audit rows after a multi-batch replay") {
    import graft.streaming.{Ev, StatefulOps}
    import graft.streaming.StatefulOps.evEnc
    val multiDir = writeEventsJson(4, "graft_anonstream")
    val stream = EventStreams.readEventStream(spark, multiDir, maxFilesPerTrigger = 1).as[Ev]
    val q = EventStreams.runToMemory(
      StatefulOps.anonymityMonitor(stream).toDF(), "anon_out", outputMode = "update")
    try {
      assert(q.recentProgress.length >= 4, "cross-batch state path not exercised")
      val rows = spark.table("anon_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6)))
      // Final emission per type = the one with the full row count.
      val finals = rows.groupBy(_._1).map { case (t, rs) => t -> rs.maxBy(_._3) }
      val want = SparkEntry.queries("q153_kanonymity_audit")(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => r.getString(0) -> ((r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
      assert(finals.keySet === want.keySet, "event_type coverage diverges")
      finals.foreach { case (t, got) =>
        assert(got === want(t), s"type $t: stream $got vs batch ${want(t)}")
      }
      // Intermediate emissions existed — the live re-emission path is
      // real, not a single end-of-stream flush.
      assert(rows.length > finals.size, "no intermediate emissions seen")
    } finally q.stop()
  }

  test("streaming t-closeness monitor (q170 twin): final emissions ≡ batch audit rows after a multi-batch replay") {
    import graft.streaming.{Ev, StatefulOps}
    import graft.streaming.StatefulOps.evEnc
    val multiDir = writeEventsJson(4, "graft_tclsstream")
    val stream = EventStreams.readEventStream(spark, multiDir, maxFilesPerTrigger = 1).as[Ev]
    // Batch parity means auditing ALL history — full-history replay is
    // the one posture that explicitly opts OUT of the r11 default
    // retention horizon (which itself must stay finite out of the box).
    assert(StatefulOps.DefaultTclsRetainDays.exists(_ > 0),
      "default t-closeness horizon is no longer finite — forever-run state is unbounded again")
    val q = EventStreams.runToMemory(
      StatefulOps.tclosenessMonitor(stream, retainDays = None).toDF(),
      "tcls_out", outputMode = "update")
    try {
      assert(q.recentProgress.length >= 4, "cross-batch state path not exercised")
      val rows = spark.table("tcls_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7), r.getDouble(8)))
      // Final emission per type = the one with the full row count.
      val finals = rows.groupBy(_._1).map { case (t, rs) => t -> rs.maxBy(_._3) }
      val want = SparkEntry.queries("q170_tcloseness_audit")(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => r.getString(0) -> ((r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
          r.getLong(7), r.getDouble(8)))).toMap
      assert(finals.keySet === want.keySet, "event_type coverage diverges")
      finals.foreach { case (t, got) =>
        assert(got === want(t), s"type $t: stream $got vs batch ${want(t)}")
      }
      assert(rows.length > finals.size, "no intermediate emissions seen")
      graft.functions.CacheScope.drain()
    } finally q.stop()
  }

  test("streaming t-closeness drift monitor (q173 twin): final emissions ≡ batch drift rows after a multi-batch replay") {
    import graft.streaming.{Ev, StatefulOps}
    import graft.streaming.StatefulOps.evEnc
    val multiDir = writeEventsJson(4, "graft_tclsdriftstream")
    val stream = EventStreams.readEventStream(spark, multiDir, maxFilesPerTrigger = 1).as[Ev]
    val q = EventStreams.runToMemory(
      StatefulOps.tclosenessDriftMonitor(stream).toDF(), "tclsdrift_out",
      outputMode = "update")
    try {
      assert(q.recentProgress.length >= 4, "cross-batch state path not exercised")
      val rows = spark.table("tclsdrift_out").collect()
      // Last emission per type (memory sink appends in batch order).
      val finals = rows.zipWithIndex.groupBy(_._1.getString(0))
        .map { case (t, rs) => t -> rs.maxBy(_._2)._1.toString }
      val want = SparkEntry.queries("q173_tcloseness_drift")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getString(0) -> r.toString).toMap
      assert(finals.keySet === want.keySet, "event_type coverage diverges")
      finals.foreach { case (t, got) =>
        assert(got === want(t), s"type $t: stream $got vs batch ${want(t)}")
      }
      assert(rows.length > finals.size, "no intermediate emissions seen")
      graft.functions.CacheScope.drain()
    } finally q.stop()
  }

  test("t-closeness monitor retention horizon: old day buckets evict, state stays O(h × bands)") {
    import graft.streaming.{Ev, StatefulOps}
    import graft.streaming.StatefulOps.evEnc
    val multiDir = writeEventsJson(4, "graft_tclsretain")
    // Horizon 1: only each type's newest observed day may remain in
    // state, so the FINAL report must audit exactly one day-group per
    // type — versus the full-history run's multi-day group counts.
    val stream = EventStreams.readEventStream(spark, multiDir, maxFilesPerTrigger = 1).as[Ev]
    val q = EventStreams.runToMemory(
      StatefulOps.tclosenessMonitor(stream, retainDays = Some(1L)).toDF(),
      "tcls_retain_out", outputMode = "update")
    try {
      val rows = spark.table("tcls_retain_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // Last emission per type (memory sink appends in batch order).
      val finals = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (t, rs) => t -> rs.maxBy(_._2)._1 }
      val fullHistory = SparkEntry.queries("q170_tcloseness_audit")(
        spark, "/root/testdata/sf0.001").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(finals.keySet === fullHistory.keySet)
      finals.foreach { case (t, (_, nGroups, nRows)) =>
        assert(nGroups === 1L,
          s"type $t: horizon-1 state retained $nGroups day-groups")
        assert(nGroups < fullHistory(t),
          s"type $t: eviction indistinguishable from full history")
        assert(nRows > 0L)
      }
      graft.functions.CacheScope.drain()
    } finally q.stop()
  }

  test("streaming skew monitor (q157 twin): final emissions ≡ exact per-type top-10 after a multi-batch replay") {
    import graft.streaming.{Ev, StatefulOps}
    import graft.streaming.StatefulOps.evEnc
    val multiDir = writeEventsJson(4, "graft_skewstream")
    val stream = EventStreams.readEventStream(spark, multiDir, maxFilesPerTrigger = 1).as[Ev]
    val q = EventStreams.runToMemory(
      StatefulOps.skewMonitor(stream).toDF(), "skew_out", outputMode = "update")
    try {
      assert(q.recentProgress.length >= 4, "cross-batch state path not exercised")
      val rows = spark.table("skew_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      // final emission per type = the one carrying the full row count
      val finals = rows.groupBy(_._1).map { case (t, rs) =>
        val nMax = rs.map(_._2).max
        t -> rs.filter(_._2 == nMax).sortBy(_._3)
      }
      // exact per-type histogram: the fixture has ≤15 users per type,
      // far under the 64-counter capacity, so the sketch must be
      // EXACT (err 0) and the shortlist must equal the true top-10
      val exact = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select("event_type", "user_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (t, es) =>
          val counts = es.groupBy(_._2).map { case (u, o) => (u, o.length.toLong) }
          t -> (es.length.toLong,
            counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10))
        }
      assert(finals.keySet === exact.keySet, "event_type coverage diverges")
      finals.foreach { case (t, got) =>
        val (nRows, top) = exact(t)
        assert(got.length === top.length, s"type $t shortlist length")
        got.zip(top).zipWithIndex.foreach { case (((_, n, rank, key, est, err), (ek, ec)), i) =>
          assert(n === nRows, s"type $t n_rows")
          assert(rank === (i + 1).toLong)
          assert(key === ek, s"type $t rank ${i + 1} key")
          assert(est === ec, s"type $t rank ${i + 1} count")
          assert(err === 0L, s"type $t rank ${i + 1}: sketch evicted below capacity")
        }
      }
      assert(rows.length > finals.values.map(_.length).sum,
        "no intermediate emissions seen")
    } finally q.stop()
  }

  test("SpaceSaving step: eviction keeps the no-false-negative bracket, deterministic victim") {
    import graft.streaming.StatefulOps.ssStep
    // capacity 3, stream: a a a b c d — d must evict the smallest
    // (count, key) victim (b, count 1) and inherit its count as err
    val seq = Seq(1L, 1L, 1L, 2L, 3L, 4L)
    var (c, e) = (Map.empty[Long, Long], Map.empty[Long, Long])
    seq.foreach { k => val r = ssStep(c, e, 3, k); c = r._1; e = r._2 }
    assert(c.keySet === Set(1L, 3L, 4L), s"counter set $c")
    assert(c(1L) === 3L && e(1L) === 0L, "heavy key stays exact")
    assert(c(4L) === 2L && e(4L) === 1L, "newcomer inherits victim count + err")
    // invariants on a longer adversarial replay: est >= true >= est - err
    val stream2 = (1 to 200).map(i => (i % 7).toLong) ++ Seq.fill(50)(9L)
    var (c2, e2) = (Map.empty[Long, Long], Map.empty[Long, Long])
    stream2.foreach { k => val r = ssStep(c2, e2, 4, k); c2 = r._1; e2 = r._2 }
    val truth = stream2.groupBy(identity).map { case (k, o) => (k, o.length.toLong) }
    c2.foreach { case (k, est) =>
      assert(est >= truth.getOrElse(k, 0L), s"key $k est below true")
      assert(est - e2(k) <= truth.getOrElse(k, 0L), s"key $k floor above true")
    }
    // the one key above n/capacity must be present
    val n = stream2.length
    truth.filter(_._2 > n / 4).keys.foreach { k =>
      assert(c2.contains(k), s"heavy key $k missing after eviction churn")
    }
  }

  test("custom bounded top-k aggregator accumulates across micro-batches to the batch answer") {
    // The claim: TopKPostings (the q87 skew-safe posting-list head) is
    // not just map-side mergeable — its merge() is correct across
    // MICRO-BATCH boundaries, i.e. the same aggregator drives an
    // incremental streaming index head. Input is split into 4 files
    // read one per trigger, so state merges 4 times; complete mode
    // emits the final buffer.
    val multiDir = writeEventsJson(4, "graft_stream4")
    val topk = udaf(graft.functions.TopKPostings(3))
    def aggOf(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .groupBy("event_type")
      .agg(topk(col("k"), col("event_id")).as("top_events"))
    val q = EventStreams.runToMemory(
      aggOf(EventStreams.readEventStream(spark, multiDir, maxFilesPerTrigger = 1)),
      "topk_stream", outputMode = "complete")
    try {
      assert(q.recentProgress.length >= 4,
        s"expected >=4 micro-batches, got ${q.recentProgress.length} — merge path not exercised")
      val got = spark.table("topk_stream").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val want = aggOf(graft.sources.Tables.events(spark, "/root/testdata/sf0.001")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got === want, "streaming top-k state diverged from the batch aggregate")
    } finally q.stop()
  }

  test("streaming CDC dedup (q181 twin): kept-set ≡ batch first-occurrence over shared chunker, no duplicate admissions") {
    import graft.streaming.CorpusStreams
    // Same 2-batch sf0.001 replay discipline as the grid twin; the
    // truth is the first-occurrence set over Corpus.cdcChunksOf in
    // (doc_id, chunk_id) order — the SAME shared chunker the stream
    // runs, itself pinned ≡ the batch SQL pipeline by OperatorSpec's
    // q181 injection replay.
    val dir = java.nio.file.Files.createTempDirectory("graft_cdcdedup").toString + "/in"
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"), col("text"))
    val mid = 250L
    docs.filter(col("doc_id") < mid).coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= mid).coalesce(1).write.mode("append").json(dir)
    val stream = CorpusStreams.readDocStream(spark, dir, maxFilesPerTrigger = 1)
    val q = graft.streaming.EventStreams.runToMemory(
      CorpusStreams.cdcDedupStream(stream).toDF(), "cdc_dedup_out",
      outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("cdc_dedup_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.length === rows.toSet.size,
        s"${rows.length - rows.toSet.size} duplicate admissions")
      val want = scala.collection.mutable.Map.empty[String, (Long, Long)]
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "text").collect()
        .sortBy(_.getLong(0)).foreach { r =>
          graft.operators.Corpus.cdcChunksOf(r.getString(1)).foreach {
            case (cid, sig, _) =>
              if (!want.contains(sig)) want(sig) = (r.getLong(0), cid)
          }
        }
      assert(rows.toSet === want.map { case (s, (d, c)) => (s, d, c) }.toSet,
        "streaming kept-set diverged from the shared-chunker first-occurrence set")
    } finally q.stop()
  }

  test("streaming boilerplate monitor (q179 twin): emitted set ≡ batch DF rule, once-only under re-delivery") {
    import graft.streaming.CorpusStreams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_boilstream").toString + "/in"
    def ts(i: Long) = new java.sql.Timestamp(1700000000000L + i * 1000)
    // The batch injection fixture, replayed in two micro-batches:
    // batch 1 holds the FIRST srcA header sight plus the srcB single
    // and the srcC intra-doc double (neither may ever emit); batch 2
    // delivers the srcA crossing AND re-delivers doc 9301 verbatim
    // (replay idempotence — the state already holds its doc id).
    val H = "h1 h2 h3 h4 h5 h6 h7 h8"
    val b1 = Seq((9301L, ts(1), "srcA", s"$H a1 a2 a3 a4 a5 a6 a7 a8"),
      (9304L, ts(2), "srcB", s"$H d1 d2 d3 d4 d5 d6 d7 d8"),
      (9305L, ts(3), "srcC", s"$H $H e1 e2 e3 e4 e5 e6 e7 e8"))
    val b2 = Seq((9302L, ts(4), "srcA", s"$H b1 b2 b3 b4 b5 b6 b7 b8"),
      (9303L, ts(5), "srcA", s"$H c1 c2 c3 c4 c5 c6 c7 c8"),
      (9301L, ts(6), "srcA", s"$H a1 a2 a3 a4 a5 a6 a7 a8"))
    b1.toDF("doc_id", "ts", "source", "text")
      .coalesce(1).write.mode("overwrite").json(dir)
    Thread.sleep(1100)
    b2.toDF("doc_id", "ts", "source", "text")
      .coalesce(1).write.mode("append").json(dir)
    val stream = spark.readStream.schema(CorpusStreams.sourcedDocSchema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = EventStreams.runToMemory(
      CorpusStreams.boilerplateStream(stream).toDF(), "boil_out",
      outputMode = "append")
    try {
      assert(q.recentProgress.length >= 2, "cross-batch path not exercised")
      val rows = spark.table("boil_out").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val md = java.security.MessageDigest.getInstance("MD5")
      val md5H = md.digest(H.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      // Exactly ONE emission ever — the srcA header in the batch
      // where its distinct-doc count crossed BoilerDfMin; the srcB
      // copy (df = 1 there) and the srcC intra-doc double stay out,
      // and the re-delivered 9301 adds nothing.
      assert(rows.toSeq === Seq(("srcA", md5H)), s"emissions: ${rows.toSeq}")
      // Parity with the batch rule over the replayed corpus (the
      // shared Corpus.boilerSigsFrom definition).
      val batchDocs = (b1 ++ b2.dropRight(1))
        .toDF("doc_id", "ts", "source", "text")
      val want = graft.operators.Corpus
        .boilerSigsFrom(graft.operators.Corpus.boilerDocSigs(batchDocs))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows.toSet === want, "stream emissions diverge from the batch DF rule")
    } finally q.stop()
  }
}
