package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A record carrying an opaque media payload plus typed metadata —
  * the multimodal-column model: binary at rest, schema'd metadata
  * alongside. */
case class MediaBlob(doc_id: Long, payload: Array[Byte], source: String)

/** Decoded / feature-extracted form of a MediaBlob. */
case class MediaFeatures(
    doc_id: Long, n_bytes: Long, width: Long, height: Long,
    n_frames: Long, feat: Array[Float])

/** Multimodal-column operators (SURVEY.md §7.1 B4): image/audio/video
  * are treated as opaque `binary` columns with typed metadata. The
  * container has no media codecs, so the DECODE step is a
  * clearly-marked deterministic stub (`StubCodec`) — the Spark-side
  * plumbing (binary schema, per-partition batch decode via
  * mapPartitions, feature arrays) is real and is what matters at
  * 100 TB: decode cost dominates, so the plan must keep it in one
  * narrow per-partition pass with no shuffle before it.
  */
object Multimodal {

  /** STUB: stands in for a real image/audio decoder (libjpeg/ffmpeg
    * are not in this container). Deterministic pure function of the
    * bytes so results are reproducible and oracle-checkable where
    * expressed in SQL. A real deployment swaps only this object. */
  object StubCodec {
    private val hex = "0123456789abcdef"
    def md5Hex(bytes: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      d.map(b => f"$b%02x").mkString
    }
    private def nibble(h: String, i: Int): Int = hex.indexOf(h.charAt(i))
    /** Fake "decode": dimensions + frame count derived from the md5 of
      * the payload; 4 float features from leading bytes. */
    def decode(b: MediaBlob): MediaFeatures = {
      val h = md5Hex(b.payload)
      val width = nibble(h, 0) * 16 + nibble(h, 1)
      val height = nibble(h, 2) * 16 + nibble(h, 3)
      val frames = b.payload.length % 30 + 1
      val feat = b.payload.take(4).map(x => (x & 0xff).toFloat / 255f)
      MediaFeatures(b.doc_id, b.payload.length.toLong, width.toLong,
        height.toLong, frames.toLong, feat)
    }
  }

  /** q31 — media metadata extraction, pure-SQL twin of the stub codec:
    * byte length, content hash, fake dimensions from the hash nibbles.
    * Runs entirely in WholeStageCodegen (binary cast + md5 + string
    * ops are Catalyst built-ins); the DuckDB oracle recomputes the
    * identical arithmetic. */
  def q31(spark: SparkSession, sfDir: String): DataFrame = {
    val hexv = (i: Int) =>
      instr(lit("0123456789abcdef"), substring(col("h"), i, 1)) - 1
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"),
        col("n_chars"))
      .withColumn("h", md5(col("payload")))
      .select(
        col("doc_id"), col("source"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("h").as("content_md5"),
        (hexv(1) * 16 + hexv(2)).cast("long").as("width"),
        (hexv(3) * 16 + hexv(4)).cast("long").as("height"),
        (col("n_chars") % 30 + 1).as("n_frames"))
      .orderBy("doc_id")
  }

  val q31Sql: String =
    """WITH m AS (
      |  SELECT doc_id, source, n_chars, encode(text) AS payload,
      |    md5(text) AS h
      |  FROM documents)
      |SELECT doc_id, source,
      | CAST(octet_length(payload) AS BIGINT) AS n_bytes,
      | h AS content_md5,
      | CAST((strpos('0123456789abcdef', substring(h,1,1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substring(h,2,1)) - 1) AS BIGINT) AS width,
      | CAST((strpos('0123456789abcdef', substring(h,3,1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substring(h,4,1)) - 1) AS BIGINT) AS height,
      | n_chars % 30 + 1 AS n_frames
      |FROM m ORDER BY doc_id""".stripMargin

  /** q32 — the batch-decode pipeline: binary payloads flow through
    * `mapPartitions` so a real codec would amortize per-partition
    * setup (model load, GPU context) across the whole batch — the
    * shape that matters for 100 TB media corpora. Returns per-doc
    * decoded features.
    *
    * Oracle-checked (r8, upgraded from the rows-only check): the
    * stub decode is deterministic byte arithmetic, so every output
    * column is re-derivable in DuckDB from the same payload bytes —
    * dims from md5 nibbles, frames from the byte count, and f0 by
    * REPLAYING THE FLOAT32 PIPELINE (CAST AS FLOAT division: bytes
    * 80/131/182 round differently under float32 vs double, measured,
    * so the oracle must divide in float32 exactly as the typed
    * MediaFeatures.feat array does). A real deployment swaps
    * StubCodec for a native decoder and this oracle for golden
    * files; the mapPartitions plumbing is unchanged either way. */
  def q32(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[MediaBlob] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as[MediaBlob]
    blobs
      .mapPartitions { it =>
        // per-partition setup of a real decoder would happen HERE, once
        it.map(StubCodec.decode)
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        // try_element_at, not element_at: a zero-byte payload decodes
        // to an EMPTY feature vector (StubCodec.take(4) of nothing — a
        // real codec finds no features in an empty blob either), and
        // ANSI element_at throws on the empty array. NULL f0 is the
        // honest output for a featureless blob; the adversarial sweep
        // (dev/nasty_fixture.py's empty document) exercises it.
        col("n_frames"),
        graft.functions.OracleRound.floorRound(
          expr("try_element_at(feat, 1)").cast("double"), 6).as("f0"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of the typed decode. Byte extraction goes through
    * `substring(hex(payload), …)` (DuckDB 1.0 has no blob slicing);
    * f0 divides in FLOAT32 (`CAST AS FLOAT`) because that is what the
    * Array[Float] feature vector stored — then the shared
    * floor(x·10⁶+0.5)/10⁶ recipe on the widened double, both engines. */
  val q32Sql: String =
    """WITH m AS (
      |  SELECT doc_id, encode(text) AS payload, md5(text) AS h
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, h, octet_length(payload) AS nb,
      |    substring(hex(payload), 1, 2) AS b0
      |  FROM m)
      |SELECT doc_id,
      | CAST(nb AS BIGINT) AS n_bytes,
      | CAST((strpos('0123456789abcdef', substring(h,1,1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substring(h,2,1)) - 1) AS BIGINT) AS width,
      | CAST((strpos('0123456789abcdef', substring(h,3,1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substring(h,4,1)) - 1) AS BIGINT) AS height,
      | CAST(nb % 30 + 1 AS BIGINT) AS n_frames,
      | CASE WHEN nb = 0 THEN NULL ELSE
      |   floor(CAST(CAST(
      |       (strpos('0123456789ABCDEF', substring(b0,1,1)) - 1) * 16
      |     + (strpos('0123456789ABCDEF', substring(b0,2,1)) - 1) AS FLOAT)
      |     / CAST(255 AS FLOAT) AS DOUBLE) * 1000000 + 0.5) / 1000000
      | END AS f0
      |FROM x ORDER BY doc_id""".stripMargin

  /** q42 — frame sampling: expand each media blob into its sampled
    * frames (every 5th of n_frames), one output row per frame, with a
    * deterministic per-frame content id — the 1→N generate/explode
    * shape of video frame extraction. The expansion is a codegen'd
    * `sequence` + explode (Generate) — no shuffle at all until the
    * presentation sort; at 100 TB frame extraction stays embarrassingly
    * parallel and the downstream (per-frame decode, q32-style) sees
    * a row stream already partitioned by source file. A real decoder
    * replaces the md5 frame id with pixel data (StubCodec note). */
  def q42(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_md5"),
        (col("n_chars") % 30 + 1).as("n_frames"))
      .select(col("doc_id"), col("content_md5"), col("n_frames"),
        explode(expr("sequence(0, n_frames - 1, 5)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("n_frames"),
        md5(concat_ws("_", col("content_md5"), col("frame_idx"))).as("frame_id"))
      .orderBy("doc_id", "frame_idx")

  val q42Sql: String =
    """WITH m AS (
      |  SELECT doc_id, md5(text) AS content_md5, n_chars % 30 + 1 AS n_frames
      |  FROM documents)
      |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, n_frames,
      | md5(content_md5 || '_' || CAST(frame_idx AS VARCHAR)) AS frame_id
      |FROM (SELECT doc_id, content_md5, n_frames,
      |        unnest(range(0, n_frames, 5)) AS frame_idx
      |      FROM m) t
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** q44 — resize planning: thumbnail dimensions (longest side → 64,
    * aspect preserved, integer arithmetic) for every media blob, from
    * the q31 metadata. The real pixel resample belongs in the q32
    * mapPartitions stage (StubCodec note); this computes the target
    * geometry the way a 100 TB thumbnailing job plans work: a pure
    * narrow projection, so planning never shuffles and the decode
    * stage receives (blob, target_w, target_h) rows ready to batch. */
  def q44(spark: SparkSession, sfDir: String): DataFrame = {
    val hexv = (i: Int) =>
      instr(lit("0123456789abcdef"), substring(col("h"), i, 1)) - 1
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .select(col("doc_id"),
        (hexv(1) * 16 + hexv(2)).cast("long").as("width"),
        (hexv(3) * 16 + hexv(4)).cast("long").as("height"))
      // zero-dimension guard: md5 nibbles can be 00
      .filter(col("width") > 0 && col("height") > 0)
      .select(col("doc_id"), col("width"), col("height"),
        when(col("width") >= col("height"), lit(64L))
          .otherwise((col("width") * 64L) / col("height")).cast("long").as("thumb_w"),
        when(col("width") >= col("height"), (col("height") * 64L) / col("width"))
          .otherwise(lit(64L)).cast("long").as("thumb_h"))
      .orderBy("doc_id")
  }

  val q44Sql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST((strpos('0123456789abcdef', substring(md5(text),1,1)) - 1) * 16
      |       + (strpos('0123456789abcdef', substring(md5(text),2,1)) - 1) AS BIGINT) AS width,
      |    CAST((strpos('0123456789abcdef', substring(md5(text),3,1)) - 1) * 16
      |       + (strpos('0123456789abcdef', substring(md5(text),4,1)) - 1) AS BIGINT) AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      | CAST(CASE WHEN width >= height THEN 64 ELSE (width * 64) // height END AS BIGINT) AS thumb_w,
      | CAST(CASE WHEN width >= height THEN (height * 64) // width ELSE 64 END AS BIGINT) AS thumb_h
      |FROM m WHERE width > 0 AND height > 0
      |ORDER BY doc_id""".stripMargin

  /** Deterministic "media tower": a 64-dim embedding of the payload,
    * standing in for a real cross-modal encoder (CLIP image tower)
    * the way [[StubCodec.decode]] stands in for a codec. Four chained
    * md5 rounds seeded by the content hash give 4×16 bytes; each byte
    * centers to (x − 127.5)/127.5 ∈ [−1, 1]. Every arithmetic step is
    * integer-or-IEEE-double and hex-replayable, so DuckDB reproduces
    * the vector bit-for-bit ([[q166Sql]]). No component can be zero
    * (x is an integer, 127.5 is not), so the vector always has a
    * direction — no zero-norm guard needed on the media side. */
  def mediaEmbed(payload: Array[Byte]): Array[Double] = {
    val h = StubCodec.md5Hex(payload)
    val out = new Array[Double](64)
    var g = 0
    while (g < 4) {
      val hg = StubCodec.md5Hex((h + "_" + g).getBytes("UTF-8"))
      var i = 0
      while (i < 16) {
        val x = Integer.parseInt(hg.substring(2 * i, 2 * i + 2), 16)
        out(16 * g + i) = (x - 127.5) / 127.5
        i += 1
      }
      g += 1
    }
    out
  }

  /** q166 — cross-modal retrieval, the multimodal family's capstone
    * (r8 verdict: the family was decode/metadata plumbing with no
    * query joining media features to the embedding surface): top-5
    * embedding-table neighbors by cosine for each of the 10 probe
    * media blobs — the CLIP-retrieval shape (encode the image, search
    * the text/embedding index).
    *
    * Scale shape = q29's serving pattern, with the media tower in
    * q32's decode stage: (1) the probe blobs decode/encode inside ONE
    * `mapPartitions` pass (a real GPU encoder amortizes its model
    * load there; the deterministic tower keeps it oracle-checkable);
    * (2) the encoded probes BROADCAST — bounded by the constant probe
    * cutoff, never corpus-proportional, so the hint is safe by
    * construction; (3) the embedding corpus streams through one scan
    * with the codegen'd native cosine, no shuffle before the
    * per-probe top-k window over O(probes) partitions. At 100 TB the
    * corpus side would instead probe an ANN index (q30/q160); this is
    * the exact-serving tier those indexes are recall-measured
    * against. */
  def q166(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.CosineSimilarity.cosine_sim
    import org.apache.spark.sql.expressions.Window
    // Null-text probes are FILTERED, not encoded: a probe with no
    // payload cannot go through the encoder, and this contract is
    // shared by all three tiers (this batch plan, the streaming twin,
    // and the DuckDB oracle's WHERE) — before r10 the three disagreed
    // (batch would NPE, stream encoded "", oracle propagated NULL).
    val probes = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 10 && col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"))
      .as[MediaBlob]
      .mapPartitions { it =>
        // per-partition setup of a real cross-modal encoder goes HERE
        it.map(b => (b.doc_id, mediaEmbed(b.payload)))
      }
      .toDF("doc_id", "mv")
    val n = Similarity.cvecs(spark, sfDir)
    val w = Window.partitionBy("doc_id").orderBy(col("cos").desc, col("vec_id"))
    n.join(broadcast(probes), lit(true))
      .withColumn("cos", cosine_sim(col("mv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("vec_id"),
        graft.functions.OracleRound.floorRound(col("cos"), 6).as("cos"))
      .orderBy("doc_id", "rank")
  }

  /** DuckDB twin: rebuilds the media vectors with the same md5-chain
    * hex arithmetic (hex pair → BIGINT via the shared '0x' cast
    * idiom; 127.5 CAST to DOUBLE so the centering runs in IEEE
    * doubles, not DECIMAL), norms them with the [[Similarity]]
    * list_aggregate recipe (same sequential accumulation order as
    * the native cosine), and replays the top-5 window. */
  val q166Sql: String =
    s"""WITH ${graft.operators.Similarity.normedSql},
      |m AS (
      |  SELECT doc_id, md5(text) AS h FROM documents
      |  WHERE doc_id < 10 AND text IS NOT NULL),
      |mg AS (
      |  SELECT m.doc_id, t.g,
      |    md5(m.h || '_' || CAST(t.g AS VARCHAR)) AS hg
      |  FROM m, range(4) t(g)),
      |md AS (
      |  SELECT doc_id, 16 * g + i.i AS d,
      |    (CAST(('0x' || substring(hg, 2 * i.i + 1, 2)) AS BIGINT)
      |       - CAST(127.5 AS DOUBLE)) / CAST(127.5 AS DOUBLE) AS vd
      |  FROM mg, range(16) i(i)),
      |mq AS (
      |  SELECT doc_id, mv,
      |    sqrt(list_aggregate(list_transform(mv, x -> x * x), 'sum')) AS mn
      |  FROM (SELECT doc_id, list(vd ORDER BY d) AS mv FROM md GROUP BY doc_id) t),
      |pairs AS (
      |  SELECT mq.doc_id, n.vec_id,
      |    list_inner_product(mq.mv, n.v) / (mq.mn * n.nrm) AS cos
      |  FROM mq, n)
      |SELECT doc_id, rank, vec_id,
      |  floor(cos * 1000000 + 0.5) / 1000000 AS cos
      |FROM (
      |  SELECT doc_id, vec_id, cos,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM pairs) t
      |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  /** q172 media near-dup geometry. 64 hyperplanes as 4 bands × 16
    * bits — the PRODUCTION near-dup setting the q37 scaladoc's sweep
    * points at (at cos ≥ 0.9, p_bit ≈ 0.9, a 16-bit band matches a
    * true pair w.p. ≈ 0.19 and a random pair w.p. 2⁻¹⁶): the media
    * tower embeds distinct payloads to near-orthogonal vectors, so
    * the 4-bit text-embedding banding (tuned for an exploratory
    * cos ≥ 0.4) would collide nearly every pair here, while 16-bit
    * bands keep expected random candidates at |pairs|·4/65536 —
    * measured (r12 re-measure, reconciling the r11 docs' stale
    * 9/756): 15 DISTINCT candidate pairs at sf0.01, 1593 at sf0.1,
    * against 125k / 12.5M total pairs (the report's per-source
    * n_cand_pairs sums to the same totals — each distinct pair
    * attributes once, via its doc_b source).
    * IDENTICAL payloads embed identically and match on every band —
    * candidate recall 1.0 for exact duplicates by construction, the
    * only true-positive class a hash tower admits (OperatorSpec pins
    * both halves). Planes reuse the q37 md5 derivation under the
    * distinct seed prefix "m". */
  private val MediaPlanes = 64
  private val MediaBandBits = 16
  private[graft] val MediaNearDupCos = 0.9

  private lazy val mediaPlanes: IndexedSeq[Array[Double]] =
    (0 until MediaPlanes).map { p =>
      Array.tabulate(64) { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"m${p}_${d}".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
      }
    }

  /** q172 — media near-duplicate detection: the multimodal leg of the
    * dedup family (r10 verdict item 1 — the one curation family that
    * had no media path; the r9 draft was rejected because a
    * locality-preserving stand-in encoder measurably failed to
    * separate, so this revisit uses the q166 tower honestly: with a
    * hash tower, true near-dups ARE exact-payload duplicates, and the
    * operator's value is the end-to-end decode → embed → band →
    * verify pipeline, which swaps to a real encoder by replacing only
    * [[mediaEmbed]]). Each media payload decodes/encodes to its
    * 64-dim tower vector inside ONE mapPartitions pass (q32's
    * amortization shape), vectors band into 4×16-bit SRP signatures,
    * banded collisions become candidates, exact cosine ≥
    * [[MediaNearDupCos]] verifies, and the higher doc_id of every
    * verified pair is dropped (q21's keeper rule). Output is the
    * per-source dedup report — assets / banded candidates / verified
    * pairs / dropped / kept (pairs attribute to the DROPPED side's
    * source) — the shape a curation dashboard consumes, and
    * non-degenerate at every scale (candidate counts are live even
    * where the fixture has no true duplicates; sf0.1 carries 8 real
    * duplicate groups).
    *
    * Scale shape: one corpus pass to decode+embed (at 100 TB this is
    * the GPU-encoder pass, amortized per partition), one banded
    * (band_idx, band_val) shuffle of O(N·bands) signature rows —
    * never an all-pairs product — and an exact-verify leg whose
    * joins stay UNHINTED (candidate volume is data-dependent; AQE
    * broadcasts the small tower relation while it fits). Everything
    * downstream of the distinct candidate set is candidate-bounded.
    * Determinism: tower, planes, bits, and cosine are all
    * md5/IEEE-double arithmetic both engines replay bit-for-bit
    * (q166's proof, extended to the plane family). */
  def q172(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.CosineSimilarity.cosine_sim
    import graft.functions.CacheScope.Ops
    val assets = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"))
      .as[MediaBlob]
      .mapPartitions { it =>
        // per-partition setup of a real media encoder goes HERE
        it.map(b => (b.doc_id, b.source, mediaEmbed(b.payload)))
      }
      .toDF("doc_id", "source", "v")
      .scopedCache // 4 consumers: sig build, 2 vector fetches, per-source assets
    assets.count()
    // Native banding loop ([[graft.functions.SrpBands]]) — 64
    // unrolled dot_product/CASE/concat columns would cross HotSpot's
    // huge-method limit and run interpreted (measured ~5 s/run at
    // sf0.1); the loop form emits bit-identical band strings.
    val sig = assets.select(col("doc_id"),
      posexplode(graft.functions.SrpBands.srp_bands(
        mediaPlanes.map(_.toSeq), MediaBandBits, col("v")))
        .as(Seq("band_idx", "band_val")))
    // DISTINCT before verification — the opposite trade from q37's
    // lshCandidates: 16-bit bands already shrink the stream to
    // O(true + random) pairs (hundreds), so deduplicating here is
    // cheap and the report needs the distinct candidate count anyway.
    val cand = sig.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_a"))
      .join(sig.select(col("band_idx"), col("band_val"), col("doc_id").as("doc_b")),
        Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
      .scopedCache // 2 consumers: the per-source count and the verify leg
    cand.count()
    val srcB = assets.select(col("doc_id").as("doc_b"), col("source"))
    val candPerSrc = cand.join(srcB, "doc_b")
      .groupBy("source").agg(count(lit(1)).as("n_cand_pairs"))
    val dup = cand
      .join(assets.select(col("doc_id").as("doc_a"), col("v").as("va")), Seq("doc_a"))
      .join(assets.select(col("doc_id").as("doc_b"), col("v").as("vb")), Seq("doc_b"))
      .filter(cosine_sim(col("va"), col("vb")) >= MediaNearDupCos)
      .select("doc_a", "doc_b")
    // One fused aggregate: n_dropped = distinct dropped ids per
    // source ≡ countDistinct(doc_b) — no separate dropped-set branch,
    // so dup stays single-consumer and needs no cache.
    val dupStats = dup.join(srcB, "doc_b")
      .groupBy("source").agg(count(lit(1)).as("n_dup_pairs"),
        countDistinct(col("doc_b")).as("n_dropped"))
    assets.groupBy("source").agg(count(lit(1)).as("n_assets"))
      .join(candPerSrc, Seq("source"), "left")
      .join(dupStats, Seq("source"), "left")
      .select(col("source"), col("n_assets"),
        coalesce(col("n_cand_pairs"), lit(0L)).as("n_cand_pairs"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_assets") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
      .orderBy("source")
  }

  /** DuckDB twin: the q166 tower recipe over ALL payloads, the q37
    * plane derivation under seed prefix "m", 16-bit band signatures
    * via string_agg, then the same candidate/verify/report algebra. */
  val q172Sql: String =
    s"""WITH m AS (
      |  SELECT doc_id, source, md5(text) AS h FROM documents
      |  WHERE text IS NOT NULL),
      |mg AS (
      |  SELECT doc_id, source, t.g,
      |    md5(m.h || '_' || CAST(t.g AS VARCHAR)) AS hg
      |  FROM m, range(4) t(g)),
      |md AS (
      |  SELECT doc_id, source, 16 * g + i.i AS d,
      |    (CAST(('0x' || substring(hg, 2 * i.i + 1, 2)) AS BIGINT)
      |       - CAST(127.5 AS DOUBLE)) / CAST(127.5 AS DOUBLE) AS vd
      |  FROM mg, range(16) i(i)),
      |mv AS (
      |  SELECT doc_id, source, list(vd ORDER BY d) AS v
      |  FROM md GROUP BY doc_id, source),
      |planes AS (
      |  SELECT p.p AS p, d.d AS d,
      |    CASE WHEN substring(md5('m' || CAST(p.p AS VARCHAR) || '_' || CAST(d.d AS VARCHAR)), 1, 1) >= '8'
      |         THEN 1.0 ELSE -1.0 END AS s
      |  FROM range($MediaPlanes) p(p), range(64) d(d)),
      |pl AS (SELECT p, list(s ORDER BY d) AS sv FROM planes GROUP BY p),
      |bits AS (
      |  SELECT mv.doc_id, pl.p,
      |    CASE WHEN list_inner_product(mv.v, pl.sv) >= 0 THEN '1' ELSE '0' END AS bit
      |  FROM mv, pl),
      |sig AS (
      |  SELECT doc_id, p // $MediaBandBits AS band_idx,
      |    string_agg(bit, '' ORDER BY p) AS band_val
      |  FROM bits GROUP BY doc_id, p // $MediaBandBits),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sig a JOIN sig b
      |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      |   AND a.doc_id < b.doc_id),
      |nv AS (
      |  SELECT doc_id, source, v,
      |    sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
      |  FROM mv),
      |dup AS (
      |  SELECT doc_a, doc_b FROM cand
      |  JOIN nv na ON na.doc_id = doc_a
      |  JOIN nv nb ON nb.doc_id = doc_b
      |  WHERE list_inner_product(na.v, nb.v) / (na.nrm * nb.nrm) >= $MediaNearDupCos),
      |ass AS (SELECT source, count(*) AS n_assets FROM m GROUP BY source),
      |cs AS (SELECT nv.source, count(*) AS n_cand_pairs
      |  FROM cand JOIN nv ON nv.doc_id = cand.doc_b GROUP BY nv.source),
      |ds AS (SELECT nv.source, count(*) AS n_dup_pairs
      |  FROM dup JOIN nv ON nv.doc_id = dup.doc_b GROUP BY nv.source),
      |dr AS (SELECT nv.source, count(*) AS n_dropped
      |  FROM (SELECT DISTINCT doc_b FROM dup) dd
      |  JOIN nv ON nv.doc_id = dd.doc_b GROUP BY nv.source)
      |SELECT ass.source, CAST(n_assets AS BIGINT) AS n_assets,
      |  CAST(coalesce(cs.n_cand_pairs, 0) AS BIGINT) AS n_cand_pairs,
      |  CAST(coalesce(ds.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
      |  CAST(coalesce(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
      |  CAST(n_assets - coalesce(dr.n_dropped, 0) AS BIGINT) AS n_kept
      |FROM ass
      |LEFT JOIN cs ON cs.source = ass.source
      |LEFT JOIN ds ON ds.source = ass.source
      |LEFT JOIN dr ON dr.source = ass.source
      |ORDER BY ass.source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_media_metadata" -> q31 _,
    "q32_media_decode_stub" -> q32 _,
    "q42_frame_sample" -> q42 _,
    "q44_resize_plan" -> q44 _,
    "q166_crossmodal_knn" -> q166 _,
    "q172_media_neardup" -> q172 _)

  val oracles: Map[String, String] = Map(
    "q31_media_metadata" -> q31Sql,
    "q32_media_decode_stub" -> q32Sql,
    "q42_frame_sample" -> q42Sql,
    "q44_resize_plan" -> q44Sql,
    "q166_crossmodal_knn" -> q166Sql,
    "q172_media_neardup" -> q172Sql)
}
