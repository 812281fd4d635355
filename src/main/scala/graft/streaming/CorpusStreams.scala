package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** A (source, length) arrival on the sourced document stream. */
case class LenArrival(source: String, len: Long)

/** Running per-source length histogram — the drift monitor's state.
  * Bounded by the length DOMAIN (documents are at most context-length
  * tokens), not by stream volume, so it needs no GC. */
case class LenHist(counts: Map[Long, Long], n_docs: Long)

/** One drift report per source per micro-batch: the current
  * two-sample KS statistic against the offline reference ECDF. */
case class DriftReport(source: String, n_docs: Long, ks_stat: Double,
    at_len: Long)

/** A chunk occurrence arriving on the document stream. */
case class ChunkArrival(sig: String, doc_id: Long, chunk_id: Long,
    ts: java.sql.Timestamp)

/** A delta-batch document arrival, pre-marked with base-signature-
  * index membership by the stream-static join. */
case class DeltaArrival(sig: String, doc_id: Long, source: String,
    in_base: Boolean, ts: java.sql.Timestamp)

/** One classification per arriving delta document, emitted by
  * [[CorpusStreams.deltaDedupStream]]: novel / dup_base / dup_delta
  * (the batch Dedup.q152 classes). */
case class DeltaClass(doc_id: Long, source: String, sig: String,
    status: String)

/** A document's MinHash band-signature occurrence on the stream. */
case class DocBandArrival(doc_id: Long, ts: java.sql.Timestamp,
    band_idx: Int, band_val: String)

/** A candidate near-duplicate document pair (doc_a < doc_b) emitted
  * by [[CorpusStreams.minhashCandidateStream]]. */
case class CandDocPair(doc_a: Long, doc_b: Long)

/** One document retained in a text band bucket's state window. */
case class DocMember(doc_id: Long, tsMs: Long)

/** State of one (band_idx, band_val) text bucket: documents seen
  * within the watermark window. */
case class DocBucketState(members: List[DocMember])

/** One unit occurrence arriving on the sourced document stream
  * (q179's granularity: source-scoped 8-token units). */
case class UnitArrival(source: String, sig: String, doc_id: Long)

/** State of one (source, sig) unit type in the boilerplate monitor:
  * distinct docs seen so far (capped at BoilerDfMin − 1 entries) and
  * whether the DF threshold has been crossed. Once crossed, the id
  * list drops and only the flag remains — state per unit type is
  * O(BoilerDfMin), forever. */
case class BoilerState(docIds: List[Long], crossed: Boolean)

/** A unit type newly classified boilerplate, emitted exactly once by
  * [[CorpusStreams.boilerplateStream]] in the micro-batch where its
  * within-source document frequency crosses the threshold. */
case class BoilerSig(source: String, sig: String)

/** A kept (first-seen) chunk emitted by
  * [[CorpusStreams.chunkDedupStream]]. */
case class KeptChunk(sig: String, doc_id: Long, chunk_id: Long)

/** Streaming twin of the batch chunk-level dedup (Corpus.q117): the
  * live-ingest half of the "nightly batch ≡ live stream" dedup story
  * the event layer already proves for row dedup (EventStreams
  * .dedupStream) and top-k state (StreamingSpec). Documents arrive as
  * an unbounded stream; each is split through the SAME
  * Corpus.chunkSigs expansion as the batch query (one shared
  * definition — the two paths cannot chunk or hash differently), and
  * only the FIRST occurrence of each chunk signature is admitted.
  *
  * Why not `dropDuplicatesWithinWatermark("sig")`: it would bound
  * state identically but keeps an ARBITRARY physical-order row per
  * sig within a micro-batch, while the batch contract keeps
  * min(doc_id, chunk_id). The flatMapGroupsWithState form makes the
  * within-batch choice deterministic, so a doc_id-ordered replay of
  * the corpus reproduces the batch kept-set exactly (StreamingSpec
  * pins this).
  *
  * Guarantee (the one a 100 TB ingest dedup actually provides, same
  * as dedupStream): a duplicate arriving within the watermark delay
  * of its sig's first sight is dropped; a duplicate arriving later
  * may be re-admitted. State is one boolean per sig seen within the
  * delay window — GC'd by event-time timeout, so O(distinct sigs per
  * window), not O(sigs ever seen); hot boilerplate chunks cost one
  * state entry regardless of copy count (the q117 skew rule, in
  * streaming form). */
object CorpusStreams {

  implicit val chunkEnc: Encoder[ChunkArrival] = Encoders.product[ChunkArrival]
  implicit val keptEnc: Encoder[KeptChunk] = Encoders.product[KeptChunk]
  implicit val strEnc: Encoder[String] = Encoders.STRING
  implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean

  /** Schema of the document stream (ts = ingest event time; streaming
    * sources deliver decoded records, so no NANOS workaround). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  /** Read a directory of JSON document files as an unbounded stream;
    * `maxFilesPerTrigger` > 0 throttles to that many files per
    * micro-batch (tests use 1 to force the cross-batch state path). */
  def readDocStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.schema(docSchema)
    val r2 = if (maxFilesPerTrigger > 0)
      r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r
    r2.json(dir)
  }

  /** Schema of the SOURCED document stream (rebalance enforcement
    * needs the source label on every arriving document). */
  val sourcedDocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** Streaming twin of the mixture rebalance (Corpus.q127) — the
    * calibrate-offline / enforce-online pattern a production ingest
    * actually runs: keep rates are computed ONCE on the reference
    * batch corpus (`Corpus.mixtureRates`, O(sources), broadcast) and
    * every arriving document is admitted iff its md5 uniform falls
    * under its source's rate (`Corpus.keepTest` — the SAME expression
    * as batch; neither the rate algebra nor the hash test can drift
    * between the two paths because both are single definitions).
    *
    * The filter is STATELESS — no watermark, no state store, exactly
    * the property that makes hash-based sampling the right enforcement
    * primitive for an unbounded stream: the keep decision depends only
    * on (doc_id, rate), so retries, reordering, and micro-batch
    * boundaries cannot change the admitted set (StreamingSpec pins
    * stream ≡ batch kept-set equality over a 2-batch replay). A
    * stream-static broadcast join is re-resolved per micro-batch, so
    * a nightly rate recalibration lands without restarting the query
    * when `rates` reads from a refreshable table.
    *
    * Admit policy for a source ABSENT from the rate table (a new
    * crawl onboarded after calibration): LEFT join + rate 1.0 —
    * admit everything until the next recalibration assigns it a real
    * rate. The conservative default for an enforcement filter is to
    * let data through visibly, not to silently discard a whole new
    * source (an inner join would); the spec pins this with an
    * unknown-source document. */
  def rebalanceStream(docs: DataFrame, rates: DataFrame): DataFrame =
    docs.join(broadcast(rates.select(col("source"), col("keep_rate"))),
        Seq("source"), "left")
      .withColumn("keep_rate", coalesce(col("keep_rate"), lit(1.0)))
      .filter(graft.operators.Corpus.keepTest)
      .select(col("doc_id"), col("source"))

  /** Streaming twin of the BPE corpus encode (TextAnalysis.q169) —
    * the SERVE half of the tokenizer loop online (r10 verdict item 7;
    * train q167 → this stream is the production train-offline /
    * encode-online shape): documents arrive, every whitespace token
    * encodes through the trained merge table, and the per-source
    * tokenizer statistics are maintained as a running streaming
    * aggregate in update mode.
    *
    * The merge table is a trained-model driver value
    * (TextAnalysis.trainedMerges — O(k) rows) compiled into the plan
    * as literals through the SHARED TextAnalysis.bpeEncodeCol, so the
    * stream cannot encode differently from batch q169 (single encode
    * definition — the decontamStream/rebalanceStream calibrate-
    * offline/enforce-online discipline). No custom state: the stats
    * are sums and a max, so Spark's native streaming aggregation
    * carries them with O(sources) state and exact integer totals —
    * the derived ratios are therefore bit-equal to batch's over a
    * fully-replayed stream (StreamingSpec pins row-equality).
    *
    * Cost note vs batch: batch q169 pre-aggregates to (source, tok)
    * and encodes each DISTINCT token once; an unbounded stream has no
    * bounded distinct-token relation to pre-aggregate, so the encode
    * projection runs per token OCCURRENCE — the standard price of
    * serving online, paid in the stateless map stage that scales out
    * with executors. */
  def bpeEncodeStream(docs: DataFrame,
      merges: Seq[(Long, String, String, String, Long)]): DataFrame = {
    import graft.functions.OracleRound.floorRound
    val st = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 1)
    st.withColumn("n_syms",
        size(split(graft.operators.TextAnalysis.bpeEncodeCol(merges), " ")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("tok")).cast("long")).as("n_chars"),
        sum(col("n_syms")).as("n_symbols"),
        max("n_syms").as("max_token_syms"),
        floorRound(sum(col("n_syms")).cast("double") /
          count(lit(1)).cast("double"), 6).as("syms_per_token"),
        floorRound(sum(length(col("tok")).cast("long")).cast("double") /
          sum(col("n_syms")).cast("double"), 6).as("chars_per_symbol"))
  }

  /** Streaming twin of the count-min sketch (TextAnalysis.q174) —
    * the operator class streaming was INVENTED for: CM state is a
    * pure mergeable sum over a FIXED 4×256 cell grid, so the running
    * sketch is just a streaming aggregation whose state store holds
    * ≤ 1 024 rows forever, no watermark, no eviction policy, no
    * per-key growth — the bounded-state property every other monitor
    * in this file has to work for comes free here. Arriving
    * documents' bigrams (the SHARED
    * [[graft.operators.TextAnalysis.bigramsOf]] emission) hash into
    * (r, bucket) cells through the SHARED
    * [[graft.operators.TextAnalysis.cmBucketSql]] row hash — neither
    * tokenization nor cell placement can drift from batch. Point
    * estimates est(g) = min over rows of cell(r, bucket(g, r)) read
    * the emitted state directly.
    *
    * Batch computes the same cells as VOCAB-weighted sums (window
    * over the distinct-gram frame); the stream counts instances
    * as they arrive. Σ instances-in-bucket ≡ Σ vocab-count-in-bucket,
    * so the two formulations must agree cell-for-cell — StreamingSpec
    * pins exactly that (against an independent pure-Scala md5 replay,
    * not against either engine path), plus estimate parity with
    * [[graft.operators.TextAnalysis.cmEstimates]] for every gram
    * after a 2-batch replay. Counts are exact integers: retries,
    * reordering, and micro-batch boundaries cannot change any cell. */
  def countMinStream(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.bigramsOf(docs)
      .select(col("gram"),
        explode(sequence(lit(0),
          lit(graft.operators.TextAnalysis.CmRows - 1))).as("r"))
      .withColumn("bucket",
        expr(graft.operators.TextAnalysis.cmBucketSql("gram")))
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("cnt"))

  implicit val unitEnc: Encoder[UnitArrival] = Encoders.product[UnitArrival]
  implicit val boilStEnc: Encoder[BoilerState] = Encoders.product[BoilerState]
  implicit val boilEnc: Encoder[BoilerSig] = Encoders.product[BoilerSig]
  implicit val srcSigEnc: Encoder[(String, String)] =
    Encoders.tuple(Encoders.STRING, Encoders.STRING)

  /** Streaming twin of the boilerplate DF rule (Corpus.q179) — the
    * discovery half runs online: every arriving document explodes
    * through the SAME Corpus.chunkSigs expansion at the SAME width as
    * batch (one shared definition — the two paths cannot segment or
    * hash differently), and a unit type is emitted as [[BoilerSig]]
    * exactly once, in the micro-batch where its within-source
    * DISTINCT-document count reaches Corpus.BoilerDfMin. A live scrub
    * consumes the emitted set as its denylist; the per-doc kept
    * ratios are batch q179's report over any corpus snapshot.
    *
    * Why flatMapGroupsWithState and not a streaming aggregation:
    * the rule counts DISTINCT docs per (source, sig), and chaining
    * dedup into a streaming agg is both unsupported and unbounded —
    * here the state codifies exactly what the rule needs and no
    * more: up to BoilerDfMin − 1 doc ids before crossing, one
    * boolean after ([[BoilerState]]). Like [[kmvStream]] there is no
    * watermark/GC — boilerplate identity is forever, state is one
    * tiny record per unit TYPE (not occurrence), and hot units cost
    * the same state as rare ones, so a billion-copy site header is
    * one flag. Re-delivered documents re-offer doc ids the state
    * already holds and change nothing — idempotent under replay by
    * construction; emission is once-only because crossing is a
    * monotone one-way transition (StreamingSpec pins the emitted set
    * ≡ the batch rule and once-only emission over a 2-batch replay
    * that re-delivers batch-1 docs). */
  def boilerplateStream(docs: DataFrame): Dataset[BoilerSig] = {
    val units = graft.operators.Corpus
      .chunkSigs(docs, Seq("source"), graft.operators.Corpus.BoilerW)
      .select(col("source"), col("sig"), col("doc_id")).as[UnitArrival]
    val dfMin = graft.operators.Corpus.BoilerDfMin
    units.groupByKey(u => (u.source, u.sig))
      .flatMapGroupsWithState[BoilerState, BoilerSig](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: (String, String), rows: Iterator[UnitArrival],
            state: GroupState[BoilerState]) =>
          val (source, sig) = key
          val st = state.getOption.getOrElse(BoilerState(Nil, crossed = false))
          if (st.crossed) Iterator.empty
          else {
            val seen = scala.collection.mutable.SortedSet(st.docIds: _*)
            var crossed = false
            rows.foreach { r =>
              if (!crossed && !seen.contains(r.doc_id)) {
                if (seen.size >= dfMin - 1) crossed = true
                else seen += r.doc_id
              }
            }
            if (crossed) {
              state.update(BoilerState(Nil, crossed = true))
              Iterator.single(BoilerSig(source, sig))
            } else {
              state.update(BoilerState(seen.toList, crossed = false))
              Iterator.empty
            }
          }
      }
  }

  /** Streaming twin of the KMV sketch builder (TextAnalysis.q178) —
    * literally the SAME pipeline as batch
    * ([[graft.operators.TextAnalysis.kmvSketches]] runs unmodified on
    * an unbounded frame): a streaming aggregation whose per-source
    * state is the k-bounded [[graft.functions.BottomKByHash]] buffer —
    * like [[countMinStream]], fixed state forever with no watermark or
    * eviction, because bounding state is what the sketch itself does.
    * The buffer dedupes on insert, so the arriving bigram stream needs
    * no distinct (which a stateful agg couldn't chain anyway); a
    * re-delivered document re-offers members the buffer already holds
    * and changes nothing — the sketch is idempotent under replay by
    * construction, not by sink dedup. Emitted rows are the per-source
    * sketches; any pairwise overlap estimate (q178's report) reads
    * them without touching data. StreamingSpec pins the final
    * per-source sketch ≡ batch over a 2-batch replay AND ≡ an
    * independent pure-Scala md5 replay. */
  def kmvStream(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.kmvSketches(docs)

  /** Streaming twin of the benchmark decontamination (TextAnalysis
    * .q68) — enforcement at ingest: the benchmark's distinct shingle
    * set is calibrated OFFLINE (TextAnalysis.benchShingles, the same
    * relation q68 builds — evals are thousands of docs, so it
    * broadcasts), and every arriving document is scored in-row: its
    * distinct 3-gram set (the SHARED Dedup.shingleSeq — the stream
    * cannot tokenize differently from batch) is intersected with the
    * broadcast set and flagged when the overlap ratio ≥ threshold.
    *
    * STATELESS like [[rebalanceStream]] — no watermark, no state
    * store: a document carries everything needed for its own
    * decision, so retries, reordering, and micro-batch boundaries
    * cannot change any flag (StreamingSpec pins stream ≡ batch flag
    * parity over a 2-batch replay). The stream-static broadcast is
    * re-resolved per micro-batch, so a benchmark refresh (new eval
    * suite added) lands without restarting the query. Documents with
    * no shingles (< k words) carry no signal and are dropped on both
    * paths identically. */
  def decontamStream(docs: DataFrame, bench: DataFrame,
      threshold: Double = 0.1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perDoc = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, graft.operators.Dedup.shingleSeq(text).toSeq.distinct)
      }.toDF("doc_id", "shs")
    perDoc
      .crossJoin(broadcast(bench.agg(collect_set("sh").as("bench_set"))))
      .filter(size(col("shs")) > 0)
      .withColumn("n_sh", size(col("shs")).cast("long"))
      .withColumn("n_hit", size(array_intersect(col("shs"), col("bench_set"))).cast("long"))
      .withColumn("ratio", graft.functions.OracleRound.floorRound(
        col("n_hit").cast("double") / col("n_sh"), 6))
      .withColumn("contaminated", col("ratio") >= lit(threshold))
      .select("doc_id", "n_sh", "n_hit", "ratio", "contaminated")
  }

  implicit val lenArrEnc: Encoder[LenArrival] = Encoders.product[LenArrival]
  implicit val lenHistEnc: Encoder[LenHist] = Encoders.product[LenHist]
  implicit val driftEnc: Encoder[DriftReport] = Encoders.product[DriftReport]

  /** Build the offline reference for [[lengthDriftStream]] from a
    * batch document corpus: the sorted (len, cumulative count) ECDF
    * table plus its total — O(distinct lengths) driver values, the
    * calibrate-offline artifact the live monitor compares against.
    * Lengths come from the SHARED TextAnalysis.docLen. */
  def lengthReference(docs: DataFrame): (Seq[(Long, Long)], Long) = {
    val counts = docs.select(graft.operators.TextAnalysis.docLen.as("len"))
      .groupBy("len").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val cums = counts.scanLeft((0L, 0L)) { case ((_, c), (len, n)) => (len, c + n) }.tail
    (cums.toSeq, counts.map(_._2).sum)
  }

  /** Streaming twin of the length-distribution drift statistic
    * (TextAnalysis.q142) — the monitor a production ingest actually
    * runs: the reference ECDF is calibrated OFFLINE on the trusted
    * corpus ([[lengthReference]], O(distinct lengths) — broadcast via
    * the closure), and each arriving document updates its source's
    * running length histogram; every micro-batch re-emits the
    * source's current two-sample KS statistic against the reference,
    * so a scrape-format change surfaces within one trigger instead of
    * at the next nightly batch.
    *
    * The sup uses the SAME integer-numerator rule as q142 —
    * |cum_src·n_all − cum_all·n_src| maximized with (gap DESC, len
    * ASC) tie-break over the union of reference and observed jump
    * points, final division as the only float, floor-rounded to 6 —
    * so when the replayed stream equals the calibration corpus the
    * final emissions reproduce q142's rows exactly (StreamingSpec
    * pins this).
    *
    * State: one (len → count) map per source, bounded by the length
    * DOMAIN (≤ context-length tokens), not by stream volume — the
    * same argument that makes q142's dense grid safe — so the state
    * store needs no timeout/GC and the monitor runs indefinitely. */
  def lengthDriftStream(docs: DataFrame,
      reference: Seq[(Long, Long)], nAll: Long): Dataset[DriftReport] = {
    val refCums: Array[(Long, Long)] = reference.sortBy(_._1).toArray
    val arrivals = docs
      .select(col("source"), graft.operators.TextAnalysis.docLen.as("len"))
      .as[LenArrival]
    arrivals.groupByKey(_.source)
      .flatMapGroupsWithState[LenHist, DriftReport](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[LenArrival], state: GroupState[LenHist]) =>
          val prev = state.getOption.getOrElse(LenHist(Map.empty, 0L))
          var counts = prev.counts
          var n = prev.n_docs
          rows.foreach { r =>
            counts = counts.updated(r.len, counts.getOrElse(r.len, 0L) + 1L)
            n += 1L
          }
          state.update(LenHist(counts, n))
          // KS over the union of jump points; cumulative counts via
          // one merged ascending sweep (reference cums are
          // precomputed; source cums accumulate in sort order).
          val jumps = (refCums.iterator.map(_._1) ++ counts.keysIterator)
            .toArray.distinct.sorted
          def refCumLE(l: Long): Long = {
            // last reference cum at len <= l (refCums ascending)
            var lo = 0; var hi = refCums.length - 1; var ans = 0L
            while (lo <= hi) {
              val m = (lo + hi) >>> 1
              if (refCums(m)._1 <= l) { ans = refCums(m)._2; lo = m + 1 }
              else hi = m - 1
            }
            ans
          }
          var cumSrc = 0L
          var bestNum = -1L
          var bestLen = 0L
          jumps.foreach { l =>
            cumSrc += counts.getOrElse(l, 0L)
            val num = math.abs(cumSrc * nAll - refCumLE(l) * n)
            if (num > bestNum) { bestNum = num; bestLen = l }
          }
          // Exact integer product then ONE double division + the
          // floorRound recipe — the same op sequence as q142's
          // DECIMAL denominator, so the doubles agree bitwise. Long
          // products hold to ~3·10⁹ docs per side; beyond that widen
          // to BigInt like q142 widens DECIMAL.
          val ks = math.floor(bestNum.toDouble / (n * nAll).toDouble * 1e6 + 0.5) / 1e6
          Iterator.single(DriftReport(source, n, ks, bestLen))
      }
  }

  implicit val deltaArrEnc: Encoder[DeltaArrival] = Encoders.product[DeltaArrival]
  implicit val deltaClassEnc: Encoder[DeltaClass] = Encoders.product[DeltaClass]

  /** Streaming twin of the incremental delta-vs-base dedup
    * (Dedup.q152) — the live half of the daily-append ingest story:
    * the base corpus's DISTINCT signature index is the
    * calibrate-offline artifact (like [[decontamStream]]'s benchmark
    * set); every arriving document md5-fingerprints itself, the
    * stream-static join marks base membership STATELESSLY, and only
    * non-base signatures consult the keeper state — novel on first
    * sight, dup_delta after — with the same within-batch min(doc_id)
    * rule as batch, so a doc_id-ordered replay reproduces q152's
    * classification exactly (StreamingSpec pins all three classes
    * across a batch-straddling replay).
    *
    * Scale: at test scale the index broadcasts; at 100 TB it is a
    * sig-bucketed static table and the same stream-static join runs
    * storage-partitioned with zero base re-shuffle (q152's scaladoc
    * argument, in streaming form). State carries one boolean per
    * NON-base sig inside the watermark window — base-dup arrivals
    * (the common case on a re-crawl) cost no state at all — GC'd by
    * event-time timeout exactly like [[firstOccurrence]]. */
  def deltaDedupStream(docs: DataFrame, baseSigs: DataFrame,
      delayMs: Long = 10L * 60 * 1000): Dataset[DeltaClass] = {
    val arrivals = docs
      .withWatermark("ts", s"$delayMs milliseconds")
      .select(md5(col("text")).as("sig"), col("doc_id"), col("source"),
        col("ts"))
      .join(broadcast(baseSigs.select(col("sig")).distinct()
        .withColumn("b", lit(true))), Seq("sig"), "left")
      .select(col("sig"), col("doc_id"), col("source"),
        coalesce(col("b"), lit(false)).as("in_base"), col("ts"))
      .as[DeltaArrival]
    arrivals.groupByKey(_.sig)
      .flatMapGroupsWithState[Boolean, DeltaClass](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (sig: String, rows: Iterator[DeltaArrival], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // Deterministic within-batch order: the batch keeper rule
            // (min doc_id first), never the micro-batch's physical
            // iterator order. Bounded by per-sig arrivals per trigger.
            val rs = rows.toArray.sortBy(_.doc_id)
            if (rs.head.in_base) {
              // A sig in the base index classifies statelessly and
              // keeps NO state — the batch rule (base membership wins
              // over within-delta ordering), and the reason a re-crawl
              // full of known documents costs zero state growth.
              rs.iterator.map(r =>
                DeltaClass(r.doc_id, r.source, sig, "dup_base"))
            } else {
              val seen = state.exists
              state.update(true)
              var maxTs = Long.MinValue
              rs.foreach(r => if (r.ts.getTime > maxTs) maxTs = r.ts.getTime)
              state.setTimeoutTimestamp(
                math.max(maxTs + delayMs, state.getCurrentWatermarkMs() + 1))
              rs.iterator.zipWithIndex.map { case (r, i) =>
                DeltaClass(r.doc_id, r.source, sig,
                  if (!seen && i == 0) "novel" else "dup_delta")
              }
            }
          }
      }
  }

  /** Watermarked first-occurrence keep over the chunk-sig stream.
    * Emits one [[KeptChunk]] per signature — the minimum
    * (doc_id, chunk_id) occurrence within the first micro-batch that
    * carries the sig. */
  def chunkDedupStream(docs: DataFrame,
      delayMs: Long = 10L * 60 * 1000): Dataset[KeptChunk] = {
    val chunks = graft.operators.Corpus.chunkSigs(docs, Seq("ts"))
      .withWatermark("ts", s"$delayMs milliseconds")
      .select(col("sig"), col("doc_id"), col("chunk_id"), col("ts"))
      .as[ChunkArrival]
    firstOccurrence(chunks, delayMs)
  }

  /** Streaming twin of the batch CDC dedup (Corpus.q181) — live
    * first-occurrence admission over CONTENT-DEFINED chunks: each
    * arriving document runs the shared pure-Scala chunker
    * (`Corpus.cdcChunksOf` — the same definition the batch spec's
    * replay pins ≡ the SQL pipeline, so stream and batch cannot
    * segment or hash differently), and the chunk stream feeds the
    * SAME [[firstOccurrence]] state machine as the grid twin
    * ([[chunkDedupStream]]) — deterministic min(doc_id, chunk_id)
    * keeper, event-time-GC'd boolean per sig. The CDC difference
    * shows exactly where it matters online: a re-crawled page with
    * one inserted token re-admits only the edited chunk, where the
    * grid twin re-admits the whole document. */
  def cdcDedupStream(docs: DataFrame,
      delayMs: Long = 10L * 60 * 1000): Dataset[KeptChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = docs
      .select(col("doc_id"), col("ts"), col("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .flatMap { case (id, ts, text) =>
        graft.operators.Corpus.cdcChunksOf(text).map { case (cid, sig, _) =>
          ChunkArrival(sig, id, cid, ts)
        }
      }
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[ChunkArrival]
    firstOccurrence(chunks, delayMs)
  }

  /** Streaming twin of the batch NORMALIZED dedup (Dedup.q139): one
    * arrival per document keyed by the SHARED canonical-form
    * signature (Dedup.normSig — the two paths cannot canonicalize
    * differently), first occurrence kept with the batch's
    * min(doc_id) keeper order. Same guarantee and state bound as
    * [[chunkDedupStream]] — one boolean per sig within the watermark
    * window; chunk_id is fixed at 0 (doc-level granularity). */
  def normalizedDedupStream(docs: DataFrame,
      delayMs: Long = 10L * 60 * 1000): Dataset[KeptChunk] = {
    val arrivals = docs
      .select(graft.operators.Dedup.normSig(col("text")).as("sig"),
        col("doc_id"), lit(0L).as("chunk_id"), col("ts"))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[ChunkArrival]
    firstOccurrence(arrivals, delayMs)
  }

  implicit val bandEnc: Encoder[DocBandArrival] = Encoders.product[DocBandArrival]
  implicit val candEnc: Encoder[CandDocPair] = Encoders.product[CandDocPair]
  implicit val bucketEnc: Encoder[DocBucketState] = Encoders.product[DocBucketState]
  implicit val bandKeyEnc: Encoder[(Int, String)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.STRING)

  /** Streaming twin of the batch MinHash+LSH candidate generator
    * (Dedup.q22) — the text-shingle counterpart of the embedding
    * near-dup stream (VectorStreams.nearDupPairStream), closing the
    * last batch family without a stream twin: live near-dup
    * CANDIDATE detection on a document ingest.
    *
    * Each arriving document computes its 6 band signatures through
    * the SAME shingle→KM-minhash→band recipe as batch q22
    * (Dedup.minhashBandSeq — shared shingleSeq tokenizer; the JVM
    * and relational evaluations are equality-pinned per document by
    * OperatorSpec), lands in its 6 band buckets, and pairs with
    * every bucket member seen within the watermark window. Band
    * collision IS candidacy (q22 emits candidates, not verified
    * duplicates), so no per-pair verification work happens in-state —
    * a pair colliding in k bands is emitted k times, exactly the
    * batch multiplicity pre-`distinct`; consumers set-collapse, as
    * the parity spec does.
    *
    * Guarantee (same trade as every twin here): a pair whose two
    * documents arrive within the watermark delay of each other is
    * detected; wider-spaced pairs are not (the earlier member aged
    * out). State per bucket is O(members-in-window) (doc_id, ts)
    * pairs — 16 bytes each, NOT document bodies or signatures, so a
    * hot boilerplate bucket costs kilobytes; members GC per-arrival
    * once the watermark passes their detect window, and idle buckets
    * drop whole via event-time timeout. Within a micro-batch,
    * arrivals process in doc_id order so a doc-ordered replay emits
    * a deterministic pair set under any partition scheduling. */
  def minhashCandidateStream(docs: DataFrame,
      delayMs: Long = 10L * 60 * 1000): Dataset[CandDocPair] = {
    import org.apache.spark.sql.Encoders
    implicit val inEnc: Encoder[(Long, java.sql.Timestamp, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.STRING)
    val bands = docs.select(col("doc_id"), col("ts"), col("text"))
      .as[(Long, java.sql.Timestamp, String)]
      .flatMap { case (id, ts, text) =>
        graft.operators.Dedup.minhashBandSeq(text)
          .map { case (b, v) => DocBandArrival(id, ts, b, v) }
      }
      .withWatermark("ts", s"$delayMs milliseconds")
    bands.groupByKey(r => (r.band_idx, r.band_val))
      .flatMapGroupsWithState[DocBucketState, CandDocPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), rows: Iterator[DocBandArrival],
         state: GroupState[DocBucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arr = rows.toArray.sortBy(_.doc_id)
            var members = state.getOption.map(_.members).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[CandDocPair]
            var maxTs = Long.MinValue
            arr.foreach { r =>
              members.foreach { m =>
                if (m.doc_id != r.doc_id)
                  out += CandDocPair(math.min(m.doc_id, r.doc_id),
                    math.max(m.doc_id, r.doc_id))
              }
              members = DocMember(r.doc_id, r.ts.getTime) :: members
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
            }
            // Per-member GC: a member is only pairable while a partner
            // could still arrive inside its delay window; past that,
            // drop it so hot boilerplate buckets stay bounded. >= not
            // >: a partner arriving EXACTLY delayMs after a member is
            // still inside the documented closed-interval "arrives
            // within the watermark delay" detection guarantee.
            val wm = state.getCurrentWatermarkMs()
            members = members.filter(_.tsMs + delayMs >= wm)
            state.update(DocBucketState(members))
            state.setTimeoutTimestamp(math.max(maxTs + delayMs, wm + 1))
            out.iterator
          }
      }
  }

  /** The shared watermarked first-occurrence keeper: emits each sig's
    * min(doc_id, chunk_id) occurrence from the first micro-batch that
    * carries it; state GC'd by event-time timeout. */
  private def firstOccurrence(chunks: Dataset[ChunkArrival],
      delayMs: Long): Dataset[KeptChunk] =
    chunks.groupByKey(_.sig)
      .flatMapGroupsWithState[Boolean, KeptChunk](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (sig: String, rows: Iterator[ChunkArrival], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // watermark passed last-sight + delay: forget the sig so
            // state stays bounded (the dropDuplicatesWithinWatermark
            // GC contract).
            state.remove()
            Iterator.empty
          } else {
            // One pass over the batch's occurrences: deterministic
            // min(doc_id, chunk_id) — the batch q117 keeper order —
            // plus max event time for the state-retention clock.
            var minDoc = Long.MaxValue
            var minChunk = Long.MaxValue
            var maxTs = Long.MinValue
            rows.foreach { r =>
              if (r.doc_id < minDoc ||
                  (r.doc_id == minDoc && r.chunk_id < minChunk)) {
                minDoc = r.doc_id; minChunk = r.chunk_id
              }
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
            }
            val isFirstSight = !state.exists
            state.update(true)
            // Retain until the watermark passes last-sight + delay;
            // the max() guards the "timeout must exceed the current
            // watermark" contract when a straggler arrives just
            // inside the window.
            state.setTimeoutTimestamp(
              math.max(maxTs + delayMs, state.getCurrentWatermarkMs() + 1))
            if (isFirstSight) Iterator.single(KeptChunk(sig, minDoc, minChunk))
            else Iterator.empty
          }
      }
}
