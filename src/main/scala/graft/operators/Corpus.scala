package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.OracleRound.{floorRound, floorRoundSql}
import graft.functions.CacheScope.Ops
import graft.sources.Tables

/** Corpus-preparation operators over `documents` — the second wave of
  * LLM training-data pipeline stages beyond TextAnalysis/Dedup:
  * context-window chunking, within-document repetition scoring,
  * TF-IDF term weighting, temperature-based domain mixing,
  * Bloom-filter decontamination, and regex denylist scrubbing.
  *
  * Tokenization stays `split(text, ' ')` (single-sourced decision,
  * see TextAnalysis) and every query is codegen'd expressions over
  * one narrow scan — the per-document ops (q69/q70/q78) have NO
  * shuffle at all except the presentation sort, so they hold at any
  * scale; the corpus-level ops (q71/q72/q76) shuffle only aggregates
  * or broadcast tiny sides.
  */
object Corpus {

  /** Context-window chunking parameters: 40-token windows advancing
    * by 20 (50% overlap) — the sliding-window shape used to cut long
    * documents into model-context-sized training samples. */
  private val ChunkWidth = 40
  private val ChunkStride = 20

  /** q69 — sliding-window document chunking: each document becomes
    * ceil(n_tokens/stride) overlapping chunks of ≤ 40 tokens, each
    * with a content signature. Pure narrow projection + generate —
    * no shuffle (Generate is pipelined into the scan), so the op is
    * embarrassingly parallel at any corpus size; chunk explosion
    * multiplies rows ~n/stride-fold, which is the intended output
    * (training samples), not an intermediate. */
  def q69(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(1), size(col("t")), lit(ChunkStride)))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(slice(col("t"), col("start"), lit(ChunkWidth))).cast("long").as("n_chunk_tokens"),
        md5(array_join(slice(col("t"), col("start"), lit(ChunkWidth)), " ")).as("chunk_sig"))
      .orderBy("doc_id", "chunk_id")

  val q69Sql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |s AS (SELECT doc_id, t,
       |        unnest(generate_series(1, len(t), $ChunkStride)) AS start
       |      FROM d)
       |SELECT doc_id, CAST((start - 1) // $ChunkStride AS BIGINT) AS chunk_id,
       | CAST(len(list_slice(t, start, start + ${ChunkWidth - 1})) AS BIGINT) AS n_chunk_tokens,
       | md5(array_to_string(list_slice(t, start, start + ${ChunkWidth - 1}), ' ')) AS chunk_sig
       |FROM s ORDER BY doc_id, chunk_id""".stripMargin

  /** q70 — within-document repetition scoring (the Gopher-style
    * dup-5-gram quality signal): fraction of a document's 5-grams
    * that are repeats of an earlier 5-gram in the SAME document.
    * Everything happens inside one row (transform + array_distinct
    * over the doc's own gram list) — a pure projection with zero
    * shuffle, the cheapest possible quality filter at 100 TB. */
  def q70(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") >= 5)
      .withColumn("grams",
        expr("transform(sequence(1, n - 4), i -> concat_ws(' ', slice(t, i, 5)))"))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct"),
        floorRound(lit(1.0) -
          size(array_distinct(col("grams"))).cast("double") / size(col("grams")), 6)
          .as("rep_ratio"))
      .orderBy("doc_id")

  val q70Sql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (SELECT doc_id,
      |        list_transform(generate_series(1, len(t) - 4),
      |          i -> array_to_string(list_slice(t, i, i + 4), ' ')) AS grams
      |      FROM d WHERE len(t) >= 5)
      |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
      | CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
      | floor((1 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)) * 1000000 + 0.5) / 1000000 AS rep_ratio
      |FROM g ORDER BY doc_id""".stripMargin

  /** q71 — TF-IDF top-3 terms per document. The document-frequency
    * table is vocabulary-sized — orders of magnitude smaller than the
    * corpus — so idf broadcasts and the only corpus-sized shuffle is
    * the (doc, term) term-frequency aggregation, which map-side
    * combines. Scores are floor-rounded BEFORE ranking so the rank
    * order itself is engine-independent (ties break on the term). */
  def q71(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(nDocs)
      .select(col("tok"), log(col("n_docs").cast("double") / col("df")).as("idf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
    tf.join(broadcast(idf), "tok")
      .withColumn("tfidf", floorRound(col("tf") * col("idf"), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("tok"), col("tfidf"))
      .orderBy("doc_id", "rk")
  }

  val q71Sql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |idf AS (SELECT tok, ln(CAST(n_docs AS DOUBLE) / count(*)) AS idf
       |        FROM tf, n GROUP BY tok, n_docs),
       |scored AS (SELECT t.doc_id, t.tok,
       |    ${floorRoundSql("t.tf * i.idf", 6)} AS tfidf
       |  FROM tf t JOIN idf i ON t.tok = i.tok)
       |SELECT doc_id, rk, tok, tfidf FROM (
       |  SELECT doc_id, tok, tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk
       |  FROM scored) r
       |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Total sample budget q72 allocates across domains. */
  private val MixBudget = 10000L

  /** q72 — temperature-based domain mixing (α = 0.5): per-source
    * token counts → sampling weight count^α → normalized share →
    * planned documents out of a fixed budget. The α < 1 power
    * flattens the domain distribution (upsamples small/rare domains)
    * — the standard multilingual/multi-domain rebalancing step. One
    * 20-group aggregate; weights summed in DECIMAL so the shares are
    * identical across engines and aggregation orders. */
  def q72(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("w", sqrt(col("n_tokens").cast("double")).cast("decimal(18,6)"))
    val tot = per.agg(sum(col("w")).as("tw"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        floorRound(col("w").cast("double") / col("tw").cast("double"), 6).as("mix_share"),
        floor(col("w").cast("double") / col("tw").cast("double") * MixBudget)
          .cast("long").as("planned_docs"))
      .orderBy("source")
  }

  val q72Sql: String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |w AS (SELECT source, n_docs, n_tokens,
       |        CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(18,6)) AS w
       |      FROM per),
       |tot AS (SELECT sum(w) AS tw FROM w)
       |SELECT source, n_docs, n_tokens,
       | ${floorRoundSql("CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)", 6)} AS mix_share,
       | CAST(floor(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) * $MixBudget) AS BIGINT) AS planned_docs
       |FROM w, tot ORDER BY source""".stripMargin

  /** q141 epoch cap: no source's corpus may repeat more than this
    * many times in the mixture (the UniMax anti-overfit knob). The
    * token budget is 9/5 of the corpus (1.8 mean epochs) via INTEGER
    * arithmetic, so both engines derive the identical BIGINT. */
  private val EpochCap = 2L

  /** q141 — UniMax-style epoch-capped budget allocation (water-
    * filling): spread a fixed token budget uniformly across sources,
    * except no source may exceed `EpochCap` epochs of its own corpus;
    * budget freed by capped sources redistributes uniformly among the
    * rest. The published closed form (Chung et al. 2023): in
    * ascending-cap order a source is capped iff its cap is below the
    * water level of the budget remaining at its rank — the test
    * `cap·(k−i+1) ≤ budget − prefix` is ALL-INTEGER, so the
    * capped-set decision is bitwise identical on any engine, and the
    * only floating point is the final level division. Completes the
    * mixture family: q72 reweights by temperature, q138 selects under
    * a budget, q141 allocates epochs under a budget with a repeat cap.
    *
    * Scale shape: one map-combined corpus aggregate to per-source
    * token counts; every window after runs over the O(sources) table.
    * Monotonicity argument for the prefix test (why a per-row window
    * suffices): once the test fails at rank i it fails at every rank
    * above — caps ascend while the remaining-budget bound descends —
    * so the capped set is exactly the rows where the row-local test
    * passes, no iteration needed. */
  def q141(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("source")
      .agg(sum("n_tokens").as("n_tokens"))
      .withColumn("cap", col("n_tokens") * EpochCap)
    val wAll = Window.partitionBy(lit(1))
    val wAsc = Window.partitionBy(lit(1)).orderBy(col("cap"), col("source"))
    val wAscRows = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val alloc = per
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("tot", sum("n_tokens").over(wAll))
      .withColumn("budget", expr("tot * 9 div 5"))
      .withColumn("i", row_number().over(wAsc).cast("long"))
      .withColumn("pfx", sum("cap").over(wAscRows) - col("cap"))
      .withColumn("is_capped",
        when(col("cap") * (col("k") - col("i") + 1L) <= col("budget") - col("pfx"),
          1L).otherwise(0L))
      .withColumn("m", sum("is_capped").over(wAll))
      .withColumn("pm",
        sum(when(col("is_capped") === 1L, col("cap")).otherwise(0L)).over(wAll))
      .withColumn("alloc_raw",
        when(col("is_capped") === 1L, col("cap").cast("double"))
          .otherwise((col("budget") - col("pm")).cast("double") /
            (col("k") - col("m")).cast("double")))
    alloc.select(col("source"), col("n_tokens"), col("cap"), col("is_capped"),
        floorRound(col("alloc_raw"), 6).as("allocated"),
        floorRound(col("alloc_raw") / col("n_tokens").cast("double"), 6).as("epochs"))
      .orderBy("source")
  }

  val q141Sql: String = {
    val allocRaw = "CASE WHEN is_capped = 1 THEN CAST(cap AS DOUBLE) " +
      "ELSE CAST(budget - pm AS DOUBLE) / CAST(k - m AS DOUBLE) END"
    s"""WITH per AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |c AS (SELECT source, n_tokens, n_tokens * $EpochCap AS cap FROM per),
       |t AS (SELECT *,
       |    count(*) OVER () AS k,
       |    (sum(n_tokens) OVER () * 9) // 5 AS budget,
       |    CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS i,
       |    sum(cap) OVER (ORDER BY cap, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cap AS pfx
       |  FROM c),
       |f AS (SELECT *,
       |    CASE WHEN cap * (k - i + 1) <= budget - pfx THEN 1 ELSE 0 END
       |      AS is_capped
       |  FROM t),
       |g AS (SELECT *,
       |    sum(is_capped) OVER () AS m,
       |    sum(CASE WHEN is_capped = 1 THEN cap ELSE 0 END) OVER () AS pm
       |  FROM f)
       |SELECT source, n_tokens, cap, CAST(is_capped AS BIGINT) AS is_capped,
       |  ${floorRoundSql(allocRaw, 6)} AS allocated,
       |  ${floorRoundSql(s"($allocRaw) / CAST(n_tokens AS DOUBLE)", 6)} AS epochs
       |FROM g ORDER BY source""".stripMargin
  }

  /** Bloom sizing for q76: ~50k distinct benchmark shingles at the
    * largest test sf; 16 bits/item ≈ 0.04% fpp. At 100 TB the same
    * two knobs scale the filter, and even a billion-item benchmark
    * set is a ~2 GB filter — still executor-broadcastable where the
    * exact distinct-set join (q68's shape) would need a shuffle. */
  private val BloomItems = 50000L
  private val BloomBits = 800000L

  private def bloomAgg(c: Column, items: Long, bits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(c),
      Bridge.expression(lit(items)), Bridge.expression(lit(bits)))
      .toAggregateExpression())

  private def mightContain(bf: Column, v: Column): Column =
    Bridge.column(BloomFilterMightContain(Bridge.expression(bf), Bridge.expression(v)))

  /** q76 — Bloom-filter benchmark decontamination: q68's pipeline
    * stage rebuilt for the regime where even the benchmark's distinct
    * shingle SET no longer broadcasts — the set compresses into a
    * fixed-size Bloom filter (one distributed aggregate), and every
    * training shingle probes the filter with zero joins. One-sided
    * error: a contaminated document can never pass unflagged (no
    * false negatives — OperatorSpec pins q76 ⊇ q68 and per-doc
    * maybe-hits ≥ exact hits); false positives are the documented
    * price and are bounded by the bits/item ratio. Engine-specific
    * filter bits → no DuckDB twin → rows-only check.
    *
    * The filter reaches the probe side as a SCALAR SUBQUERY
    * (`Dataset.scalar`) — `might_contain` requires a constant/subquery
    * filter arg, and this is exactly how Spark's own injected runtime
    * bloom filters ship the blob to executors. */
  def q76(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Dedup.shinglesWithSource(spark, sfDir)
      .scopedCache
    sh.count() // eager: bench + train branches must not race the cache
    val bloom = sh.filter(col("source") === "src0")
      .agg(bloomAgg(xxhash64(col("sh")), BloomItems, BloomBits).as("bf"))
      .scalar()
    val train = sh.filter(col("source") =!= "src0")
    train
      .withColumn("maybe", mightContain(bloom, xxhash64(col("sh"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe_hit"))
      .withColumn("maybe_ratio",
        floorRound(col("n_maybe_hit").cast("double") / col("n_sh"), 6))
      .filter(col("maybe_ratio") >= 0.1)
      .select("doc_id", "n_sh", "n_maybe_hit", "maybe_ratio")
      .orderBy("doc_id")
  }

  /** Denylist for q78 — stands in for PII patterns (emails, phone
    * numbers, IDs); this corpus is synthetic word soup, so the
    * denylist uses terms that actually occur. The operator IS the
    * redactor: swap the pattern, keep the plan. */
  private val ScrubPattern = "\\b(the|a|of|and|to|in)\\b"
  private val ScrubToken = "<SCRUBBED>"

  /** q78 — regex denylist scrubbing (the PII-redaction shape):
    * per-document match counts plus a signature and length of the
    * redacted text. Pure codegen'd projection, no shuffle — scrubbing
    * cost is one regex pass per document regardless of corpus size.
    * The regex subset used (\b, alternation) is shared by Java and
    * RE2, so the oracle redacts identically. */
  def q78(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(ScrubPattern), lit(0)))
          .cast("long").as("n_matches"),
        md5(regexp_replace(col("text"), ScrubPattern, ScrubToken)).as("scrub_sig"),
        length(regexp_replace(col("text"), ScrubPattern, ScrubToken))
          .cast("long").as("scrub_len"))
      .orderBy("doc_id")

  val q78Sql: String =
    s"""SELECT doc_id,
       | CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|to|in)\\b')) AS BIGINT) AS n_matches,
       | md5(regexp_replace(text, '\\b(the|a|of|and|to|in)\\b', '$ScrubToken', 'g')) AS scrub_sig,
       | CAST(len(regexp_replace(text, '\\b(the|a|of|and|to|in)\\b', '$ScrubToken', 'g')) AS BIGINT) AS scrub_len
       |FROM documents ORDER BY doc_id""".stripMargin

  /** BM25 parameters (Robertson/Spärck Jones defaults) and the fixed
    * query — retrieval is parameterized by a query-term set; the
    * registered query uses one so the oracle is closed-form. */
  private val Bm25K1 = "1.2"
  private val Bm25B = "0.75"
  private val Bm25Terms = Seq("hash", "join", "scan")
  private val Bm25TopK = 15

  /** The per-(doc, term) BM25 contribution, written ONCE and
    * evaluated by BOTH engines (Spark `expr` and DuckDB SQL text) so
    * the operation order — and therefore every IEEE intermediate —
    * is identical. Columns: c = term frequency, dl = document token
    * length, df = term document frequency, n = corpus size, avgdl. */
  private val bm25TermRaw: String =
    s"ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) * " +
      s"((CAST(c AS DOUBLE) * ($Bm25K1 + 1.0)) / " +
      s"(CAST(c AS DOUBLE) + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * CAST(dl AS DOUBLE) / avgdl)))"

  /** `ln` is not bit-identical across engines (1-ulp libm vs JVM
    * Math.log skew, observed on q114) — floorRound each term to 12
    * decimals (>> the ulp skew, << the 1e-6 output quantum; <=3
    * terms/doc so accumulation is negligible) before the
    * order-independent DECIMAL sum. */
  private val bm25TermFormula: String =
    s"CAST(${floorRoundSql(bm25TermRaw, 12)} AS DECIMAL(28,12))"

  /** Corpus-size stats, same single-string discipline: exact integer
    * sum, ONE division — never avg(), whose internal accumulation
    * order differs between engines. */
  private val bm25AvgdlFormula = "CAST(sum(dl) AS DOUBLE) / count(*)"

  /** q113 — BM25 ranked retrieval: top-k documents for a query-term
    * set, the lexical-retrieval baseline every RAG/eval pipeline
    * runs. Shape, bottom-up: document length (dl) rides along the
    * token explode as a narrow derived column, so term frequencies
    * and dl come out of one corpus pass with NO doc-level join; the
    * query-term filter sits under the aggregate, so the tf shuffle
    * carries only matching tokens (at 100 TB: |docs containing a
    * query term|, not |corpus tokens|). Corpus stats (n, avgdl) are
    * a one-row aggregate over a SECOND scan — deliberately separate:
    * they need every document (including ones with no query term),
    * the scan is column-pruned to size(split(text)) with no explode,
    * and caching the tokenized corpus to save it would cost more
    * than the scan (the q68 lesson). Everything else is O(terms) or
    * O(1) and broadcasts: df is a groupBy over the already-tiny tf
    * table, stats cross-join in as a broadcast.
    * Scoring is the shared-formula + DECIMAL-sum + floorRound
    * discipline (see OracleRound), top-k is a TakeOrdered, never a
    * global sort. */
  def q113(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"), col("t"))
    val stats = docs.agg(count(lit(1)).as("n"),
      expr(bm25AvgdlFormula).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("t")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"), max("dl").as("dl"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", expr(bm25TermFormula))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        floorRound(sum(col("term_score")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
  }

  val q113Sql: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |docs AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, t FROM d),
       |stats AS (SELECT count(*) AS n, $bm25AvgdlFormula AS avgdl FROM docs),
       |tf AS (
       |  SELECT doc_id, tok, count(*) AS c, max(dl) AS dl FROM (
       |    SELECT doc_id, dl, unnest(t) AS tok FROM docs) u
       |  WHERE tok IN ($terms) GROUP BY doc_id, tok),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |scored AS (
       |  SELECT tf.doc_id,
       |    $bm25TermFormula AS term_score
       |  FROM tf JOIN dft ON tf.tok = dft.tok CROSS JOIN stats)
       |SELECT doc_id, count(*) AS n_terms,
       |  ${floorRoundSql("CAST(sum(term_score) AS DOUBLE)", 6)} AS score
       |FROM scored GROUP BY doc_id
       |ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  /** q117 chunk width; stride == width so units are disjoint (dedup
    * wants paragraphs, not overlapping windows). */
  private val DedupChunkW = 40

  /** Shared chunk→sig expansion — batch q117 AND its streaming twin
    * (streaming/CorpusStreams.chunkDedupStream) call THIS, so the two
    * paths cannot silently chunk or hash differently: disjoint
    * `width`-token chunks (default [[DedupChunkW]]), 0-based
    * chunk_id, sig = md5 of the chunk's space-joined tokens. Columns
    * named in `passthrough` ride along (the stream threads its
    * event-time column through; q179 threads `source`). */
  private[graft] def chunkSigs(docs: DataFrame,
      passthrough: Seq[String] = Nil,
      width: Int = DedupChunkW): DataFrame = {
    val keep = passthrough.map(col)
    docs
      .select(Seq(col("doc_id"), split(col("text"), " ").as("t")) ++ keep: _*)
      .select(Seq(col("doc_id"), col("t"),
        posexplode(sequence(lit(1), size(col("t")), lit(width)))
          .as(Seq("chunk_id", "start"))) ++ keep: _*)
      .select(Seq(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        md5(array_join(slice(col("t"), col("start"), lit(width)), " ")).as("sig"))
        ++ keep: _*)
  }

  /** q117 — chunk-level (sub-document) deduplication: split every
    * document into disjoint 40-token chunks, keep only the FIRST
    * occurrence of each distinct chunk corpus-wide (first = lowest
    * (doc_id, chunk_id)), and report per-document retention — the
    * FineWeb/RefinedWeb-style stage that removes boilerplate
    * paragraphs repeated across pages without dropping whole
    * documents.
    *
    * Skew discipline: first-occurrence selection is NOT a window
    * (`row_number over (partition by sig)` puts every copy of a hot
    * boilerplate chunk in one partition — the q87 lesson); it is
    * `min(struct(doc_id, chunk_id))` — a mergeable aggregate that
    * partially reduces map-side, so a chunk repeated a billion times
    * costs one row per map task. The join back is on the 32-byte md5
    * sig (never chunk text), and the per-doc rollup shuffles doc_id
    * only. */
  def q117(spark: SparkSession, sfDir: String): DataFrame = {
    // Both the firsts aggregate and the join-back consume the SAME
    // full chunk row set (not disjoint subsets as in q68/q101), and
    // their exchanges differ canonically (partial-agg vs plain sig
    // shuffle) so exchange reuse cannot apply — without the persist
    // the tokenize+md5 pass over the corpus runs twice. The chunk
    // table is 1/ChunkW-th of the token count with a 32-byte sig, so
    // the cache is small; eager count() materializes it before the
    // two consumers race.
    val ch = chunkSigs(Tables.documents(spark, sfDir))
      .scopedCache
    ch.count()
    val firsts = ch.groupBy("sig")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("keeper"))
    ch.join(firsts, "sig")
      .withColumn("kept",
        (struct(col("doc_id"), col("chunk_id")) === col("keeper")).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("kept").as("n_kept"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        floorRound(col("n_kept").cast("double") / col("n_chunks"), 6).as("kept_ratio"))
      .orderBy("doc_id")
  }

  val q117Sql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |s AS (SELECT doc_id, t,
       |        unnest(generate_series(1, len(t), $DedupChunkW)) AS start
       |      FROM d),
       |c AS (SELECT doc_id, CAST((start - 1) // $DedupChunkW AS BIGINT) AS chunk_id,
       |        md5(array_to_string(list_slice(t, start, start + ${DedupChunkW - 1}), ' ')) AS sig
       |      FROM s),
       |k AS (SELECT doc_id, chunk_id,
       |        row_number() OVER (PARTITION BY sig ORDER BY doc_id, chunk_id) AS rk
       |      FROM c)
       |SELECT doc_id, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  ${floorRoundSql(
            "CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS kept_ratio
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q179 unit width and within-source document-frequency threshold.
    * 8-token disjoint units stand in for "lines" (the fixture text
    * has no newlines); DfMin = 2 because fixture sources hold only
    * tens-to-hundreds of docs — a production corpus would set the
    * threshold as a share of source size the way CCNet does, and the
    * plan below is threshold-agnostic (the DF aggregate is computed
    * either way; only the filter constant changes). */
  private[graft] val BoilerW = 8
  private[graft] val BoilerDfMin = 2

  /** Per-(source, unit-sig, doc) instance counts — the shared first
    * stage of batch q179 and the streaming boilerplate monitor
    * ([[graft.streaming.CorpusStreams.boilerplateStream]] consumes
    * the same [[chunkSigs]] expansion at the same width, so the two
    * paths cannot segment or hash differently). Mergeable aggregate:
    * a unit repeated across a million docs of one source partially
    * reduces map-side per (sig, doc), never concentrating a hot sig
    * on one task. */
  private[graft] def boilerDocSigs(docs: DataFrame): DataFrame =
    chunkSigs(docs, Seq("source"), BoilerW)
      .groupBy("source", "sig", "doc_id")
      .agg(count(lit(1)).as("n_inst"))

  /** The DF rule itself, factored from [[q179]] so the batch query,
    * the streaming monitor's parity spec, and any scrub consumer
    * share ONE definition of "boilerplate": unit types whose
    * distinct-doc count within their source reaches [[BoilerDfMin]].
    * Input is [[boilerDocSigs]] (or a cached copy of it). */
  private[graft] def boilerSigsFrom(perDocSig: DataFrame): DataFrame =
    perDocSig.groupBy("source", "sig")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerDfMin)
      .select(col("source"), col("sig"))

  /** q179 — within-source boilerplate scrub (CCNet/RefinedWeb rule):
    * a unit whose DOCUMENT frequency within its source reaches
    * [[BoilerDfMin]] is boilerplate (site header/footer/nav) and is
    * dropped EVERYWHERE — including its first occurrence. That is
    * the semantic difference from the roster's other sub-document
    * dedups: q117 keeps the first copy of each chunk corpus-wide,
    * q175 masks later copies of repeated spans; q179 removes all
    * copies, but only when the repetition crosses sources' own DF
    * threshold, so a passage repeated inside ONE document (q70's
    * domain) is untouched. Output: per-doc unit counts, boilerplate
    * unit counts, and kept ratio.
    *
    * Scale shape (the q117 discipline): three shuffles, all on
    * 32-hex sigs or doc_id — (source, sig, doc) partial aggregate,
    * (source, sig) DF aggregate over the already-reduced rows, and
    * the per-doc rollup; text never shuffles. The DF-qualified
    * boilerplate set is a small fraction of unit types (17/9231 even
    * at sf0.1's near-dup-rich fixture), so the join back is
    * broadcast-eligible at fixture scale and AQE keeps it a hash
    * join at corpus scale. The doc-sig relation is consumed twice
    * (DF derivation + join-back) with canonically different
    * exchanges, so it is cached like q117's chunk table — one row
    * per (doc, unit type) with a 32-byte sig. */
  def q179(spark: SparkSession, sfDir: String): DataFrame = {
    val perDocSig = boilerDocSigs(Tables.documents(spark, sfDir)).scopedCache
    perDocSig.count()
    val boiler = boilerSigsFrom(perDocSig).withColumn("is_boiler", lit(1L))
    perDocSig.join(boiler, Seq("source", "sig"), "left")
      .groupBy("doc_id", "source")
      .agg(sum("n_inst").as("n_units"),
        coalesce(sum(when(col("is_boiler").isNotNull, col("n_inst"))), lit(0L))
          .as("n_boiler"))
      .select(col("doc_id"), col("source"), col("n_units"), col("n_boiler"),
        floorRound((col("n_units") - col("n_boiler")).cast("double") /
          col("n_units").cast("double"), 6).as("kept_ratio"))
      .orderBy("doc_id")
  }

  val q179Sql: String =
    s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
       |s AS (SELECT doc_id, source, t,
       |        unnest(generate_series(1, len(t), $BoilerW)) AS start
       |      FROM d),
       |c AS (SELECT doc_id, source,
       |        md5(array_to_string(list_slice(t, start, start + ${BoilerW - 1}), ' ')) AS sig
       |      FROM s),
       |pd AS (SELECT source, sig, doc_id, count(*) AS n_inst
       |       FROM c GROUP BY 1, 2, 3),
       |b AS (SELECT source, sig FROM pd
       |      GROUP BY source, sig HAVING count(*) >= $BoilerDfMin)
       |SELECT pd.doc_id, pd.source,
       |  CAST(sum(pd.n_inst) AS BIGINT) AS n_units,
       |  CAST(coalesce(sum(CASE WHEN b.sig IS NOT NULL THEN pd.n_inst END), 0) AS BIGINT) AS n_boiler,
       |  ${floorRoundSql(
            "CAST(sum(pd.n_inst) - coalesce(sum(CASE WHEN b.sig IS NOT NULL THEN pd.n_inst END), 0) AS DOUBLE) / CAST(sum(pd.n_inst) AS DOUBLE)", 6)} AS kept_ratio
       |FROM pd LEFT JOIN b ON pd.source = b.source AND pd.sig = b.sig
       |GROUP BY 1, 2 ORDER BY pd.doc_id""".stripMargin

  /** q181 CDC parameters: boundary window width (the content the
    * boundary decision hashes) and divisor (expected chunk length ≈
    * CdcD tokens — 1-in-CdcD positions qualify). Production CDC adds
    * min/max chunk guards (FastCDC); the pure rule keeps the oracle
    * twin exact and the re-synchronization property is what the spec
    * pins. */
  private[graft] val CdcW = 8
  private[graft] val CdcD = 16

  /** md5 hex of a UTF-8 string — the same primitive Spark's `md5`
    * and DuckDB's `md5` evaluate, for driver-side replays. */
  private[graft] object Md5Hex {
    def of(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Pure-Scala CDC chunker — ONE definition consumed by the
    * streaming twin ([[graft.streaming.CorpusStreams.cdcDedupStream]]
    * runs it per arriving document) and by the batch spec's
    * independent replay, and proven ≡ the batch SQL pipeline by the
    * q181 injection spec + StreamingSpec parity pin (a doc's chunks
    * depend only on its own text, so the function is stateless and
    * per-row — exactly what a stream wants). Returns (chunk_id, sig,
    * clen) per chunk. */
  private[graft] def cdcChunksOf(text: String): Seq[(Long, String, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val t = text.split(" ", -1)
    val n = t.length
    val interior = (CdcW until n).filter(i =>
      h32(t.slice(i - CdcW, i).mkString(" ")) % CdcD == 0)
    val ends = interior :+ n
    ends.zip(0 +: ends.dropRight(1)).zipWithIndex.map { case ((e, s), j) =>
      (j.toLong, Md5Hex.of(t.slice(s, e).mkString(" ")), (e - s).toLong)
    }
  }

  /** q181 — content-defined chunking (CDC) dedup: chunk boundaries
    * are placed where the hash of the LAST [[CdcW]] tokens satisfies
    * h mod [[CdcD]] = 0 (Rabin/LBFS-family rule, token granularity),
    * then first-occurrence dedup over the CDC chunk set with q117's
    * keeper algebra. The property fixed-grid chunking (q117) cannot
    * have, and the reason storage/corpus dedup uses CDC: an
    * insertion shifts EVERY downstream grid chunk (q117 sees a
    * 1-token-prefixed copy as 100% novel), but CDC boundaries are
    * functions of content windows, so they re-synchronize right
    * after the edit and every later chunk deduplicates — the
    * injection spec measures exactly that (grid shares 0 chunks,
    * CDC shares all but the edited one).
    *
    * Shape: the boundary-detect explode evaluates its window hash
    * scan-side and emits ONLY (doc_id, i) boundary rows (~1/D of
    * positions) plus one sentinel per doc, so the lag window that
    * derives spans moves a few integers per doc; the token array
    * crosses exactly ONE exchange — the doc_id join that brings each
    * doc to its spans for slicing, each doc shipped once (the pin
    * allows precisely that one t-carrying hashpartitioning(doc_id)
    * exchange and no other). NOT the in-row HOF form: a
    * filter/transform lambda pipeline computes the same chunks with
    * zero text movement but runs interpreted — measured 41 s vs
    * 1.7 s at sf0.1, the file-header CodegenFallback lesson at ×20.
    * Chunk sigs then run q117's exact algebra — mergeable min-struct
    * firsts, 32-hex-sig join-back, doc_id rollup. */
  def q181(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    // interior boundaries (i < n; a boundary AT n folds into the
    // sentinel) — t feeds the hash here and is dropped before any
    // exchange; strict > keeps the sequence ascending.
    val bounds = docs.filter(size(col("t")) > CdcW)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(CdcW), size(col("t")) - 1)).as("i"))
      .filter(expr(graft.functions.HashBucket.bucketExpr(
        s"array_join(slice(t, i - ${CdcW - 1}, $CdcW), ' ')", CdcD)) === 0)
      .select(col("doc_id"), col("i"))
    val sentinel = docs.select(col("doc_id"), size(col("t")).as("i"))
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    val spans = bounds.unionByName(sentinel)
      .withColumn("start", coalesce(lag(col("i"), 1).over(wDoc), lit(0)) + 1)
      .withColumn("chunk_id", (row_number().over(wDoc) - 1).cast("long"))
    val chunks = spans.join(docs, "doc_id")
      .select(col("doc_id"), col("chunk_id"),
        md5(array_join(slice(col("t"), col("start"),
          col("i") - col("start") + 1), " ")).as("sig"),
        (col("i") - col("start") + 1).cast("long").as("clen"))
    val ch = chunks.scopedCache
    ch.count()
    // n_kept per doc NEVER needs the chunk stream joined back on sig:
    // each sig has exactly one keeper (the min (doc_id, chunk_id)
    // struct), so counting keepers grouped by their doc_id IS the
    // per-doc kept count. The previous join-back form shipped every
    // chunk row through TWO sig-keyed exchanges (the groupBy and the
    // re-join); this form's sig exchange carries only map-side partial
    // min-structs (one per distinct sig per task) and the final join is
    // doc-grain × doc-grain (broadcast). Bonus: the per-doc rollup now
    // runs with ZERO exchange — the cached chunk relation is already
    // hash(doc_id)-partitioned by the span window, and without the sig
    // join-back in between Catalyst keeps that partitioning. Measured
    // r12: steady-state 1.70 → 1.27 s solo at sf0.1 (min of 3).
    val keptPerDoc = ch.groupBy("sig")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("keeper"))
      .groupBy(col("keeper.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_kept"))
    ch.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("clen").as("n_tokens"))
      .join(keptPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        floorRound(coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_chunks"), 6).as("kept_ratio"),
        floorRound(col("n_tokens").cast("double") / col("n_chunks"), 6).as("mean_chunk_len"))
      .orderBy("doc_id")
  }

  val q181Sql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |p AS (SELECT doc_id, t, unnest(range($CdcW, len(t) + 1)) AS i
       |      FROM d WHERE len(t) >= $CdcW),
       |b AS (SELECT doc_id, t, i FROM p
       |      WHERE ${graft.functions.HashBucket.bucketSql(
              s"array_to_string(list_slice(t, i - ${CdcW - 1}, i), ' ')", CdcD)} = 0),
       |bn AS (SELECT DISTINCT doc_id, t, i FROM
       |        (SELECT * FROM b UNION ALL SELECT doc_id, t, len(t) AS i FROM d) u),
       |ch AS (SELECT doc_id,
       |        CAST(row_number() OVER w - 1 AS BIGINT) AS chunk_id,
       |        md5(array_to_string(list_slice(t,
       |          coalesce(lag(i) OVER w, 0) + 1, i), ' ')) AS sig,
       |        CAST(i - coalesce(lag(i) OVER w, 0) AS BIGINT) AS clen
       |       FROM bn WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
       |k AS (SELECT doc_id, chunk_id, clen,
       |        row_number() OVER (PARTITION BY sig ORDER BY doc_id, chunk_id) AS rk
       |      FROM ch)
       |SELECT doc_id, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  ${floorRoundSql(
            "CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS kept_ratio,
       |  ${floorRoundSql("CAST(sum(clen) AS DOUBLE) / count(*)", 6)} AS mean_chunk_len
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The calibrate-offline half of [[q127]], factored so the batch
    * query and the streaming enforcement twin
    * ([[graft.streaming.CorpusStreams.rebalanceStream]]) consume ONE
    * rate definition and cannot drift: per-source token rollup →
    * broadcastable (source, shares, keep_rate) table. Input must
    * carry (source, n_tokens). */
  def mixtureRates(perDoc: DataFrame): DataFrame = {
    val per = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("src_tokens"))
    val tot = per.agg(sum("src_tokens").as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("actual_share",
        col("src_tokens").cast("double") / col("tot_tokens").cast("double"))
      .withColumn("keep_rate",
        least(lit(1.0),
          lit(1.0) / col("n_sources").cast("double") / col("actual_share")))
  }

  /** The enforce half: the deterministic md5 keep test, ONE
    * definition for batch and stream. */
  val keepTest: Column =
    expr(graft.functions.HashBucket.rawExpr("doc_id"))
      .cast("double") / 4294967296.0 < col("keep_rate")

  /** q127 — target-mixture rebalancing by deterministic downsampling:
    * bring every source to an EQUAL token share (the flatten-to-
    * uniform target; q72's α-temperature is the planning view, this
    * is the enforcement view) by computing per-source keep rates
    * min(1, target_share / actual_share) ([[mixtureRates]]) and
    * keeping exactly the documents whose
    * [[graft.functions.HashBucket]] uniform falls under their
    * source's rate ([[keepTest]]). No RNG: the same documents survive
    * on any engine, partitioning, or retry — the reproducibility
    * property a 100 TB rebalancing job actually needs, and the same
    * primitive q50/q80/q102 already share.
    *
    * Scale shape: two corpus passes are inherent (keep rates depend
    * on global per-source totals; any one-pass scheme would need the
    * future). Pass 1 is a narrow (source, n_tokens) rollup —
    * map-side partial, O(sources) result. The rate table then
    * BROADCASTS (sources are bounded, ~20); pass 2 is one codegen'd
    * scan with the md5 test fused — no shuffle of document rows at
    * all, only the O(sources) kept-rollup exchange. Reported
    * achieved_share proves the rebalance worked (≈ target for
    * downsampled sources; < target only where rate capped at 1).
    *
    * Numerics: token totals are exact BIGINT sums; shares and rates
    * divide those in DOUBLE (bit-identical on both engines given
    * identical operand trees); presentation doubles floorRound-ed. */
  def q127(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val rates = mixtureRates(docs)
    val kept = docs
      .join(broadcast(rates.select("source", "keep_rate")), Seq("source"))
      .filter(keepTest)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_tokens").as("kept_tokens"))
    val keptTot = kept.agg(sum("kept_tokens").as("kt"))
    // kept is O(sources) by construction — broadcast the presentation
    // join too, so the whole plan stays sort-merge-free (pinned).
    rates.join(broadcast(kept), Seq("source"), "left").crossJoin(broadcast(keptTot))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        floorRound(col("actual_share"), 6).as("actual_share"),
        floorRound(col("keep_rate"), 6).as("keep_rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        floorRound(coalesce(col("kept_tokens"), lit(0L)).cast("double")
          / col("kt").cast("double"), 6).as("achieved_share"))
      .orderBy("source")
  }

  val q127Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS src_tokens
       |  FROM d GROUP BY source),
       |tot AS (
       |  SELECT CAST(sum(src_tokens) AS BIGINT) AS tot_tokens,
       |    count(*) AS n_sources
       |  FROM per),
       |rates AS (
       |  SELECT p.source, p.n_docs, p.src_tokens,
       |    CAST(p.src_tokens AS DOUBLE) / CAST(t.tot_tokens AS DOUBLE)
       |      AS actual_share,
       |    least(1.0, 1.0 / CAST(t.n_sources AS DOUBLE)
       |      / (CAST(p.src_tokens AS DOUBLE) / CAST(t.tot_tokens AS DOUBLE)))
       |      AS keep_rate
       |  FROM per p, tot t),
       |kept AS (
       |  SELECT d.source, count(*) AS n_kept,
       |    CAST(sum(d.n_tokens) AS BIGINT) AS kept_tokens
       |  FROM d JOIN rates r ON d.source = r.source
       |  WHERE CAST(${graft.functions.HashBucket.rawSql("d.doc_id")} AS DOUBLE)
       |    / 4294967296.0 < r.keep_rate
       |  GROUP BY d.source),
       |kt AS (SELECT CAST(sum(kept_tokens) AS BIGINT) AS kt FROM kept)
       |SELECT r.source, r.n_docs, r.src_tokens,
       |  ${floorRoundSql("r.actual_share", 6)} AS actual_share,
       |  ${floorRoundSql("r.keep_rate", 6)} AS keep_rate,
       |  coalesce(k.n_kept, 0) AS n_kept,
       |  coalesce(k.kept_tokens, 0) AS kept_tokens,
       |  ${floorRoundSql(
            "CAST(coalesce(k.kept_tokens, 0) AS DOUBLE) / CAST(kt.kt AS DOUBLE)", 6)}
       |    AS achieved_share
       |FROM rates r LEFT JOIN kept k ON r.source = k.source, kt
       |ORDER BY r.source""".stripMargin

  /** q149 — sort-free curriculum interleave audit: give every
    * document a deterministic within-source shuffle rank (md5 order —
    * the q50 seeded-shuffle discipline), define the global training
    * order as round-robin across sources by (rank, source), and audit
    * the interleave per source: document count, first/last global
    * position, and the MAXIMUM gap between consecutive appearances —
    * the number a curriculum/mixture designer checks to guarantee no
    * source starves for more than max_gap consecutive samples.
    *
    * The scale point is HOW the global position is computed: not with
    * a global sort (the naive row_number the oracle twin uses), but
    * in closed form —
    *   pos(doc) = Σ_{s'} min(rk−1, n_{s'}) + |{s' : n_{s'} ≥ rk, s' ≤ s}|
    * — which needs only the per-source count table (O(sources), it
    * broadcasts) against each doc row. The broadcast expansion is
    * collapsed back to one row per doc by a map-side-combined
    * aggregate BEFORE any shuffle, so no stage ever materializes a
    * globally-sorted corpus; the only shuffles are the two
    * per-source windows (within-source rank, within-source gaps).
    * Every value is an integer — the Spark/oracle match is exact by
    * construction, and the oracle's naive global row_number proves
    * the closed form ≡ the sort it replaces. */
  def q149(spark: SparkSession, sfDir: String): DataFrame = {
    val ranked = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
      .withColumn("h", md5(concat(lit("cur"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("h", "doc_id")).cast("long"))
      .drop("h")
    val counts = ranked.groupBy(col("source").as("s2"))
      .agg(count(lit(1)).as("n_s"))
    val pos = ranked.crossJoin(broadcast(counts))
      .groupBy("doc_id", "source")
      .agg((sum(least(col("rk") - 1, col("n_s"))) +
        count(when(col("n_s") >= col("rk") && col("s2") <= col("source"), 1)))
        .as("pos"))
    val wsrc = Window.partitionBy("source").orderBy("pos")
    pos.withColumn("gap", col("pos") - lag("pos", 1).over(wsrc))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        min("pos").as("first_pos"),
        max("pos").as("last_pos"),
        coalesce(max("gap"), lit(0L)).as("max_gap"))
      .orderBy("source")
  }

  val q149Sql: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5('cur' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (ORDER BY rk, source, doc_id) AS pos
      |  FROM r),
      |g AS (
      |  SELECT source, pos,
      |    pos - lag(pos) OVER (PARTITION BY source ORDER BY pos) AS gap
      |  FROM p)
      |SELECT source, count(*) AS n_docs,
      |  CAST(min(pos) AS BIGINT) AS first_pos,
      |  CAST(max(pos) AS BIGINT) AS last_pos,
      |  CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap
      |FROM g GROUP BY source ORDER BY source""".stripMargin

  /** q161 leg width (per-leg shortlist size) and the RRF smoothing
    * constant (Cormack/Clarke/Büttcher SIGIR 2009's k = 60). */
  private val RrfLegK = 30
  private val RrfC = "60.0"

  /** The RRF contribution of one leg's rank column, written ONCE and
    * instantiated for both engines: 1/(k + rank), 0 when the doc is
    * outside that leg's shortlist. */
  private def rrfTermSql(rank: String): String =
    s"coalesce(1.0 / ($RrfC + CAST($rank AS DOUBLE)), 0.0)"

  /** q161 — hybrid retrieval via reciprocal-rank fusion: the standard
    * two-tower RAG serving shape. Leg 1 (lexical) is q113's BM25
    * scorer over the fixed query-term set; leg 2 (semantic) is cosine
    * similarity against a probe embedding (the lowest-id nonzero-norm
    * vector — deterministic on both engines, and the nrm > 0 guard is
    * the q36 zero-norm/NaN discipline). Each leg keeps only its
    * top-[[RrfLegK]] shortlist; fusion scores every shortlisted doc
    * 1/(60+r_lex) + 1/(60+r_sem) (absent leg contributes 0 — ranks,
    * not scores, so the two legs' incomparable scales never need
    * calibration, the whole point of RRF) and reports the fused
    * top-10 with both leg ranks.
    *
    * Scale shape: the legs are the bounded primitives the suite
    * already prices — BM25's term-filtered tf shuffle (only docs
    * containing a query term reach the aggregate) and one narrow
    * cosine projection with a TakeOrdered head; NOTHING global is
    * ranked — fusion operates on ≤ 2·[[RrfLegK]] rows, so corpus
    * size never appears after the leg heads. At 100 TB each leg's
    * shortlist would come from its own index (q113's inverted
    * postings, q160's ADC) — the fusion stage is unchanged.
    *
    * Determinism: leg ranks are integers ordered by (bit-stable
    * score, doc_id) — BM25's floorRound-12-per-term DECIMAL sum and
    * the q29-proven cosine equivalence; the RRF sum is two exact
    * divisions added in fixed textual order. */
  def q161(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.CosineSimilarity.cosine_sim
    // ---- lexical leg: q113's scorer, shortlisted ----
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"), col("t"))
    val stats = docs.agg(count(lit(1)).as("n"),
      expr(bm25AvgdlFormula).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("t")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"), max("dl").as("dl"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val lexScored = tf.join(broadcast(dft), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", expr(bm25TermFormula))
      .groupBy("doc_id")
      .agg(floorRound(sum(col("term_score")).cast("double"), 6).as("score"))
    val lex = lexScored
      .orderBy(col("score").desc, col("doc_id")).limit(RrfLegK)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "lex_rank")
    // ---- semantic leg: cosine vs the lowest-id valid probe ----
    // vec_id ≡ doc_id in the fixtures; the reader is Similarity's
    // canonical cvecs (len filter + double cast + zero-norm guard) so
    // this leg can never rank a different vector universe than
    // q29/q162 when that discipline evolves
    val nn = Similarity.cvecs(spark, sfDir)
    val pr = nn.orderBy("vec_id").limit(1).collect()(0)
    val qv = pr.getSeq[Double](1).toSeq
    val sem = nn
      .withColumn("cos", cosine_sim(typedlit(qv), col("v")))
      .orderBy(col("cos").desc, col("vec_id")).limit(RrfLegK)
      .withColumn("sem_rank", row_number()
        .over(Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("doc_id"), col("sem_rank"))
    // ---- fusion: O(2·LegK) rows from here on ----
    val rrf = expr(rrfTermSql("lex_rank")) + expr(rrfTermSql("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", rrf)
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"),
        floorRound(col("rrf"), 6).as("rrf_score"))
  }

  val q161Sql: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |docs AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, t FROM d),
       |stats AS (SELECT count(*) AS n, $bm25AvgdlFormula AS avgdl FROM docs),
       |tf AS (
       |  SELECT doc_id, tok, count(*) AS c, max(dl) AS dl FROM (
       |    SELECT doc_id, dl, unnest(t) AS tok FROM docs) u
       |  WHERE tok IN ($terms) GROUP BY doc_id, tok),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |lexscored AS (
       |  SELECT doc_id,
       |    ${floorRoundSql("CAST(sum(term_score) AS DOUBLE)", 6)} AS score
       |  FROM (
       |    SELECT tf.doc_id, $bm25TermFormula AS term_score
       |    FROM tf JOIN dft ON tf.tok = dft.tok CROSS JOIN stats) s
       |  GROUP BY doc_id),
       |lex AS (
       |  SELECT doc_id, lex_rank FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
       |    FROM lexscored) r WHERE lex_rank <= $RrfLegK),
       |${Similarity.normedSql},
       |probe AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n
       |  ORDER BY vec_id LIMIT 1),
       |semscored AS (
       |  SELECT n.vec_id AS doc_id,
       |    list_inner_product(qv, n.v) / (qn * n.nrm) AS cos
       |  FROM n, probe),
       |sem AS (
       |  SELECT doc_id, sem_rank FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
       |    FROM semscored) r WHERE sem_rank <= $RrfLegK),
       |fused AS (
       |  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       |    lex.lex_rank, sem.sem_rank,
       |    ${rrfTermSql("lex.lex_rank")} + ${rrfTermSql("sem.sem_rank")} AS rrf
       |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id,
       |  CAST(coalesce(lex_rank, 0) AS BIGINT) AS lex_rank,
       |  CAST(coalesce(sem_rank, 0) AS BIGINT) AS sem_rank,
       |  ${floorRoundSql("rrf", 6)} AS rrf_score
       |FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q161_hybrid_rrf" -> q161 _,
    "q69_doc_chunking" -> q69 _,
    "q70_repetition_score" -> q70 _,
    "q71_tfidf_topterms" -> q71 _,
    "q72_domain_mixture" -> q72 _,
    "q76_bloom_decontam" -> q76 _,
    "q78_regex_scrub" -> q78 _,
    "q113_bm25_retrieval" -> q113 _,
    "q117_chunk_dedup" -> q117 _,
    "q127_mixture_rebalance" -> q127 _,
    "q179_boilerplate_scrub" -> q179 _,
    "q181_cdc_dedup" -> q181 _,
    "q141_unimax_epochs" -> q141 _,
    "q149_curriculum_interleave" -> q149 _)

  val oracles: Map[String, String] = Map(
    "q161_hybrid_rrf" -> q161Sql,
    "q69_doc_chunking" -> q69Sql,
    "q70_repetition_score" -> q70Sql,
    "q71_tfidf_topterms" -> q71Sql,
    "q72_domain_mixture" -> q72Sql,
    "q78_regex_scrub" -> q78Sql,
    "q113_bm25_retrieval" -> q113Sql,
    "q117_chunk_dedup" -> q117Sql,
    "q127_mixture_rebalance" -> q127Sql,
    "q179_boilerplate_scrub" -> q179Sql,
    "q181_cdc_dedup" -> q181Sql,
    "q141_unimax_epochs" -> q141Sql,
    "q149_curriculum_interleave" -> q149Sql)
}
