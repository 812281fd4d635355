package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.OracleRound.{floorRound, floorRoundSql}
import graft.functions.CacheScope.Ops
import graft.sources.Tables

/** Similarity search over `embeddings` (SURVEY.md §7.1 B4):
  * brute-force cosine top-k as the exact baseline, an IVF
  * (inverted-file) probe as the approximate search scale path, and
  * embedding-cosine near-duplicate detection (exact q36 + sign-
  * random-projection LSH q37) for the dedup checklist.
  *
  * Float discipline: embeddings are float32 at rest; both engines cast
  * to double FIRST and compute dot products as a sequential
  * left-to-right double sum (the native `cosine_sim`/`dot_product`
  * expressions ≙ DuckDB `list_inner_product`), so scores agree
  * bitwise. Ranking queries (q29/q30) still compare only ranks with
  * vec_id tie-breaks; where scores ARE emitted (q36/q37/q56) they go
  * through OracleRound.floorRound — deterministic cross-engine
  * rounding of bitwise-equal inputs.
  */
object Similarity {

  /** Fixture embedding dimensionality — the dimension CONTRACT every
    * reader in this file pins (declared first: vals initialize in
    * order, and the oracle CTE strings below interpolate it; a
    * forward reference would silently interpolate 0). */
  private[graft] val Dim = 64

  /** k-means parameters: [[KmeansK]] is the FLOOR cell count (and the
    * fixed per-subspace PQ codebook size — codebook width is a
    * bit-budget constant, never data-sized) and 3 Lloyd iterations —
    * enough to move every centroid off its seed point; IVF index
    * builds converge in single-digit iterations. Declared up here
    * with [[Dim]]: the q30/q132 oracle strings interpolate them at
    * val-init time (same forward-reference trap as Dim's). */
  private val KmeansK = 8
  private val KmeansIters = 3

  /** IVF nlist as a FUNCTION of corpus size (r10 verdict item 3: a
    * constant k=8 made per-cell pair volume — q133's Σ|cell|²/N,
    * q163's within-cell cross-language joins — grow quadratically
    * with the corpus; the measured q163 ×10 ratio 3.8 was exactly
    * this constant's cost). The rule targets a constant EXPECTED
    * CELL SIZE: nlist = clamp([[KmeansK]], 4096, ⌈N / 64⌉), so
    * E|cell| ≈ 64 at every scale — the SemDeDup/IVF production
    * posture (cells grow with the corpus; the paper's 50k cells at
    * billions of rows is this same rule at ~10⁻⁵ the density). All
    * integer arithmetic — ⌈N/64⌉ = (N + 63) div 64 — so the oracle
    * CTEs recompute the IDENTICAL value from count(*) with no
    * cross-engine float concern. At the fixtures: N = 500 → 8
    * (sf0.001/sf0.01 unchanged), N = 2000 → 32 (sf0.1). The 4096 cap
    * bounds the centroid-literal expression the narrow argmax
    * compiles ([[centStructs]]); past it (N > 256k here, far beyond
    * the local envelope) a production build switches the centroid
    * side from plan literals to a broadcast relation. Lloyd training
    * at nlist ∝ N costs O(N·nlist·d) per iteration exactly as real
    * IVF builds do — production trains on a bounded SAMPLE of the
    * corpus, which changes none of the serving plans here. */
  private[graft] val IvfTargetCell = 64L
  private[graft] def ivfNlist(n: Long): Long =
    math.max(KmeansK.toLong, math.min(4096L, (n + IvfTargetCell - 1) / IvfTargetCell))

  /** Lloyd TRAINING-set cap (r12): with nlist ∝ N, training on the
    * full corpus costs O(N²/64·d) per iteration — quadratic until
    * the 4096 nlist cap linearizes it at N > 256k, and the dominant
    * lump in the sf1 decade sweep (q77 8.2 s, ×8.1). Production IVF
    * builds train on a bounded sample (faiss's max_points_per_
    * centroid discipline), so the loop now trains on an EXPECTED
    * [[TrainCap]]-point deterministic hash sample: keep vec iff
    * md5bucket(vec_id, 2²⁰)·N < TrainCap·2²⁰ — the q173 integer
    * cross-multiply, exact on both engines, and for N ≤ TrainCap the
    * inequality is always true, so every fixture at sf ≤ 0.1 trains
    * on the FULL set and all existing results are bit-identical.
    * Serving (the final q77 assignment, the ivf-assign index, every
    * probe) stays full-corpus — only the mean-update loop samples.
    * At 100 TB: training cost becomes O(TrainCap·nlist·d) ≈ 2G flops
    * regardless of N, vs the ~10^12-flop full-corpus loop. */
  private[graft] val TrainCap = 8192L
  private[graft] val TrainBucketMod = 1L << 20

  /** SQL twin of [[ivfNlist]] over base relation `$base` — a one-row
    * CTE body the seed CTE reads, regenerated per instantiation so
    * engine and oracle can never disagree on the cell count. */
  private def ivfNlistSql(base: String): String =
    s"SELECT greatest($KmeansK, least(4096, (count(*) + ${IvfTargetCell - 1}) // $IvfTargetCell)) AS kk FROM $base"

  /** Product-quantization geometry (q158): M subspaces of Dim/M
    * dimensions, each with its own [[KmeansK]]-codeword codebook
    * trained by the same [[KmeansIters]]-step Lloyd recipe as q77.
    * Declared with [[Dim]] for the same val-init-order reason. */
  private val PqM = 4
  private val PqSubDim = Dim / PqM

  import graft.functions.CosineSimilarity.cosine_sim

  /** Embeddings with double-cast vectors (a codegen'd Cast — floats
    * widen exactly). Cosine itself is the native graft expression
    * `cosine_sim` (tight codegen loop; see functions/CosineSimilarity),
    * which computes dot and both norms in one pass per pair.
    *
    * Dimension contract: NULL or ragged vectors (failed/truncated
    * encoder output) are excluded HERE, at the shared reader — dot
    * products and distances are undefined across unequal dims,
    * DuckDB's list_inner_product/list_distance hard-error on them
    * (killing a whole oracle query), and Spark's loop would silently
    * compute something instead. Every oracle CTE applies the twin
    * `len(embedding) = Dim` filter. Exercised by the ragged/NULL
    * adversarial probe (dev notes). */
  private[graft] def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === Dim)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** COSINE-SPACE reader: [[vecs]] minus zero-norm vectors. A
    * zero-norm embedding (a failed encoder output) has no direction;
    * cosine against it is 0/0, and the two engines disagree on what
    * NaN then does (Spark orders NaN above every double and passes
    * `>= t` filters; DuckDB does not) — so the similarity layer
    * EXCLUDES such records up front on both engines (`WHERE nrm > 0`
    * in [[normedSql]]), the same validation a production ingest
    * applies. The filter is the native codegen'd `dot_product(v,v)`.
    * L2-space consumers (q58 k-NN, q77 k-means) keep the raw
    * [[vecs]]: distance to a zero vector is well-defined and both
    * engines agree. Exercised by the adversarial zero-vector stratum
    * dev/nasty_fixture.py always applies to embeddings. */
  private[graft] def cvecs(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.DotProduct.dot_product
    vecs(spark, sfDir).filter(dot_product(col("v"), col("v")) > 0.0)
  }

  private[graft] val normedSql: String =
    s"""n AS (
      |  SELECT vec_id, v, nrm FROM (
      |    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |      sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
      |        x -> x * x), 'sum')) AS nrm
      |    FROM embeddings WHERE len(embedding) = $Dim) t0
      |  WHERE nrm > 0
      |)""".stripMargin

  /** q29 — brute-force cosine k-NN: top-5 neighbors for each of the
    * 20 probe vectors. The probe set broadcasts (it is always small);
    * the corpus streams through one scan — O(Q×N) flops but only one
    * pass over the data and no shuffle until the per-query top-k,
    * which TakeOrdered-style windows keep at O(Q×k) rows. */
  def q29(spark: SparkSession, sfDir: String): DataFrame = {
    val n = cvecs(spark, sfDir)
    val q = n.select(col("vec_id").as("q_id"), col("v").as("qv"))
      .filter(col("q_id") < 20)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  val q29Sql: String =
    s"""WITH $normedSql,
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 20),
       |pairs AS (
       |  SELECT q_id, vec_id,
       |    list_inner_product(qv, v) / (qn * nrm) AS cos
       |  FROM q, n WHERE vec_id <> q_id
       |)
       |SELECT q_id, rank, neighbor_id FROM (
       |  SELECT q_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM pairs) t
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Nearest-centroid L2 assignment as a pure NARROW map: the
    * centroids are already on the driver, so argmin is one
    * expression per row — an array of (dist, c_id) structs reduced
    * by array_min (struct ordering = (dist ASC, c_id ASC), the same
    * tie-break as the oracle's row_number) — instead of a k×N cross
    * join + window, which would shuffle 8× the corpus per iteration
    * for no reason. */
  private[graft] def assignL2(n: DataFrame, cent: Seq[(Long, Seq[Double])]): DataFrame = {
    // Native loop expression, NOT k unrolled l2_distance structs: at
    // scale-aware nlist the unrolled form's generated method crosses
    // HotSpot's huge-method limit and runs interpreted (see
    // [[graft.functions.CentroidScores]]); scores are bit-identical.
    // r12: the argmin is fused into the native loop (CentroidBest) —
    // array_min over the k-struct score array allocated 2k boxed
    // values per row just to reduce them (selection bit-identical,
    // see the expression's contract).
    val best = graft.functions.CentroidBest.centroid_l2_best(cent, col("v"))
    n.withColumn("best", best)
      .select(col("vec_id"), col("v"),
        col("best.c_id").as("cluster"), col("best.dist").as("dist"))
  }

  /** One in-driver Lloyd step over the bounded training sample —
    * assign every sample vector to its nearest centroid and return
    * the per-cluster per-dimension means of the member vectors,
    * clusters with no members dropped, sorted by cluster id. Shared
    * by [[lloydTrain]] and [[pqTrain]] (one subspace = one call).
    *
    * Bit-exactness contract (the reason this is safe to run on the
    * driver at all — the oracle CTEs recompute every step):
    *  - assignment = [[graft.functions.CentroidBest.bestL2Index]],
    *    the expression's own sequential Σd²+sqrt loop and
    *    (Double.compare, c_id) tie rule (parity-spec-pinned);
    *  - each member value enters the mean as Spark's
    *    CAST(x AS DECIMAL(28,12)) — java BigDecimal.valueOf (the
    *    canonical Double.toString decimal, exactly Scala's
    *    BigDecimal(d) inside Spark's Cast) setScale(12, HALF_UP);
    *  - sums are exact BigDecimal adds (associative, so iteration
    *    order cannot matter — the property the distributed DECIMAL
    *    aggregate already relied on), the final
    *    CAST(sum AS DOUBLE) / count is BigDecimal.doubleValue over
    *    a double division — step for step the old
    *    sum(x::DECIMAL(28,12))::DOUBLE / count(*) job.
    * TrainCapSpec asserts this step ≡ the distributed DECIMAL means
    * job bit-for-bit on real fixtures. */
  private def lloydStepLocal(rows: Array[Array[Double]],
      cent: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = {
    val cmat = cent.map(_._2.toArray).toArray
    val cids = cent.map(_._1).toArray
    val k = cmat.length
    val d = if (rows.isEmpty) 0 else rows(0).length
    val sums = Array.fill(k, d)(java.math.BigDecimal.ZERO)
    val cnts = new Array[Long](k)
    var r = 0
    while (r < rows.length) {
      val v = rows(r)
      val c = graft.functions.CentroidBest.bestL2Index(cmat, cids, v)
      cnts(c) += 1
      var i = 0
      while (i < d) {
        sums(c)(i) = sums(c)(i).add(java.math.BigDecimal.valueOf(v(i))
          .setScale(12, java.math.RoundingMode.HALF_UP))
        i += 1
      }
      r += 1
    }
    (0 until k).filter(cnts(_) > 0L).map { c =>
      (cids(c), (0 until d).map(i => sums(c)(i).doubleValue() / cnts(c).toDouble): Seq[Double])
    }.sortBy(_._1)
  }

  /** Lloyd's k-means training, shared by q77 (the training query) and
    * the IVF index family (q30/q132 serve the trained cells). Two
    * Spark jobs — the seed collect (vec_id < k, a pruned filter) and
    * ONE collect of the bounded [[TrainCap]] hash sample — then the
    * whole iteration loop runs in the driver over that sample
    * ([[lloydStepLocal]]). The sample is ≤ TrainCap×[[Dim]] doubles
    * (≤ 4 MB) FOREVER — scale-independent by construction, the same
    * bounded-driver-state class as the O(k·d) centroids themselves —
    * so no per-iteration cluster job exists at ANY corpus size
    * (r12: each distributed means round cost ~0.3 s of posexplode +
    * 2048-group DECIMAL aggregate + collect machinery at sf0.1 to
    * average 2 000 vectors, ×3 iterations ×every trainer; at 100 TB
    * the same rounds would be cluster-wide job launches to average
    * 8 192 rows).
    *
    * Determinism discipline: [[lloydStepLocal]] mirrors the
    * distributed DECIMAL(28,12) means job bit for bit (see its
    * contract), so every iteration's centroids — and therefore every
    * assignment — are bit-identical in Spark and the unrolled-CTE
    * DuckDB twin ([[kmeansCtesSql]]), exactly as before. `cnt` is the
    * caller's corpus count (callers already need it for [[ivfNlist]]
    * / the sample rule, and passing it avoids a redundant count job). */
  private def lloydTrain(n: DataFrame, cnt: Long): Seq[(Long, Seq[Double])] = {
    val k = ivfNlist(cnt)
    var cent: Seq[(Long, Seq[Double])] =
      n.filter(col("vec_id") < k).orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    // Bounded training sample ([[TrainCap]] scaladoc): full set at
    // fixture scales, expected-TrainCap hash sample beyond.
    val rows: Array[Array[Double]] = n.filter(
        expr(graft.functions.HashBucket.bucketExpr("vec_id", TrainBucketMod)) *
          lit(cnt) < lit(TrainCap * TrainBucketMod))
      .collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 1 to KmeansIters) cent = lloydStepLocal(rows, cent)
    cent
  }

  /** Trained-centroid memo, keyed by canonical fixture dir: an ANN
    * index is trained ONCE and then served many times, so the index
    * queries (q30/q132) reuse a single Lloyd run per corpus instead
    * of re-training per query. Sound to cache: training is fully
    * deterministic (seeds are vec_id < k, means are DECIMAL sums),
    * and the entry is plain driver values — O(k·d) doubles — so it
    * survives `spark.catalog.clearCache()` and never pins executor
    * memory. q77 always re-trains (it IS the training benchmark) and
    * refreshes the memo with the identical value. Keyed by the corpus
    * FINGERPRINT (path + file sizes/mtimes — [[graft.sources.Tables.fingerprint]]),
    * not the bare path: if the data at the path is regenerated within
    * a session the memo re-trains instead of serving stale centroids. */
  private val centroidMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Seq[Double])]]()

  private[graft] def trainedCentroids(spark: SparkSession, sfDir: String): Seq[(Long, Seq[Double])] = {
    val key = graft.sources.Tables.fingerprint(sfDir, Seq("embeddings"))
    centroidMemo.computeIfAbsent(key, _ => {
      // No corpus persist (r12): with the in-driver loop the corpus
      // is read exactly twice (count + sample/seed collects share a
      // scan each) — nothing re-reads it, so a persist would pin
      // corpus-scale memory at 100 TB to accelerate nothing.
      val n = vecs(spark, sfDir)
      lloydTrain(n, n.count())
    })
  }

  /** The `ivf-assign` family index: the (vec_id, v, cluster) posting
    * relation every IVF-family consumer used to re-derive per query
    * (r11 verdict item 2 — q30/q132/q133/q163 each paid the same
    * narrow argmax pass; at sf1 that was ~2 s × 4). This is exactly
    * the artifact a real IVF service stores alongside its centroids —
    * the inverted lists — so it lives under the
    * [[graft.functions.FamilyIndex]] discipline: built once per
    * corpus fingerprint, persisted MEMORY_AND_DISK, superseded when
    * the fixture is regenerated in-session, self-healing after a
    * harness clearCache. Carrying `v` is deliberate: the index also
    * serves fetch joins (the cell-scoped q37/q54 exact-cosine
    * confirm reads vectors straight from the posting relation
    * instead of re-scanning parquet) — what a vector store
    * materializes anyway. O(N·(d+2)) values, the cosine-space
    * corpus's own width, stored once per family lifetime. The build
    * itself stays the zero-shuffle narrow argmax (centroid literals
    * via [[centStructs]]), so serving it changes no consumer's
    * exchange count — it only deletes their repeated scan+argmax
    * subtrees. */
  private[graft] def ivfAssignIndex(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.FamilyIndex.of("ivf-assign", spark,
      Tables.fingerprint(sfDir, Seq("embeddings"))) { () =>
      val cents = trainedCentroids(spark, sfDir)
      val asg = cvecs(spark, sfDir)
        .withColumn("best",
          graft.functions.CentroidBest.centroid_negcos_best(cents, col("v")))
        .select(col("vec_id"), col("v"), col("best.c_id").as("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      asg.count() // eager — consumers read posting lists, not parquet
      asg
    }

  /** Unrolled Lloyd-iteration CTE chain over base relation `$base`
    * (must expose vec_id, v with len(v) = `dim`) — defines
    * `${pfx}c0` (seeds) through `${pfx}c[[KmeansIters]]` (the
    * trained centroids). Shared by q77Sql and the IVF oracles
    * (q30/q132) so the trained-centroid definition can never drift
    * between the training query and the index queries that serve
    * it; q158's PQ oracle instantiates it once per subspace
    * (dim = [[PqSubDim]], distinct prefixes). `scaleK = true` (the
    * IVF family) seeds [[ivfNlist]]-of-count(*) cells via the
    * `${pfx}nl` CTE; `scaleK = false` (the PQ codebooks) keeps the
    * fixed [[KmeansK]]-codeword width — codebook size is a bit-budget
    * constant, not a data-sized knob. */
  private def kmeansCtesSql(base: String, dim: Int = Dim, pfx: String = "",
      scaleK: Boolean = true): String = {
    // BOTH families iterate over the bounded training sample
    // ([[TrainCap]] scaladoc — identical to base at fixture scales):
    // the IVF family since the r12 q77 wave, the PQ codebooks
    // (scaleK = false, fixed k) since the q158 follow-up. The seed
    // and the count stay on base, so only the mean-update loop
    // samples — the [[lloydTrain]]/[[pqTrain]] twins exactly.
    val trn = s"${pfx}tr"
    val iters = (1 to KmeansIters).map { i =>
      s"""${pfx}a$i AS (SELECT vec_id, v, cluster, dist FROM (
         |  SELECT $trn.vec_id, $trn.v, c.c_id AS cluster, list_distance(c.cv, $trn.v) AS dist,
         |    row_number() OVER (PARTITION BY $trn.vec_id
         |      ORDER BY list_distance(c.cv, $trn.v), c.c_id) AS rk
         |  FROM $trn, ${pfx}c${i - 1} c) t WHERE rk = 1),
         |${pfx}c$i AS (SELECT cluster AS c_id, list(m ORDER BY pos) AS cv FROM (
         |  SELECT cluster, pos,
         |    CAST(sum(CAST(v[pos] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
         |  FROM ${pfx}a$i, (SELECT unnest(generate_series(1, $dim)) AS pos) p
         |  GROUP BY cluster, pos) e GROUP BY cluster)""".stripMargin
    }.mkString(",\n")
    val seed =
      if (scaleK)
        s"""${pfx}nl AS (${ivfNlistSql(base)}),
           |${pfx}cn AS (SELECT count(*) AS cnt FROM $base),
           |${pfx}tr AS (SELECT vec_id, v FROM $base
           |  WHERE ${graft.functions.HashBucket.bucketSql("vec_id", TrainBucketMod)}
           |    * (SELECT cnt FROM ${pfx}cn) < ${TrainCap * TrainBucketMod}),
           |${pfx}c0 AS (SELECT vec_id AS c_id, v AS cv FROM $base
           |  WHERE vec_id < (SELECT kk FROM ${pfx}nl))""".stripMargin
      else
        s"""${pfx}cn AS (SELECT count(*) AS cnt FROM $base),
           |${pfx}tr AS (SELECT vec_id, v FROM $base
           |  WHERE ${graft.functions.HashBucket.bucketSql("vec_id", TrainBucketMod)}
           |    * (SELECT cnt FROM ${pfx}cn) < ${TrainCap * TrainBucketMod}),
           |${pfx}c0 AS (SELECT vec_id AS c_id, v AS cv FROM $base WHERE vec_id < $KmeansK)""".stripMargin
    s"""$seed,
       |$iters""".stripMargin
  }

  /** Per-row (negcos, c_id) struct array over the trained centroid
    * literals — the REFERENCE form of the family's cosine argmax:
    * `array_min` of it is the best cell (struct ordering = negcos ASC
    * then c_id ASC ≡ the oracle's ORDER BY cos DESC, c_id). The hot
    * paths all use the fused [[graft.functions.CentroidBest]]
    * selection instead (r12 — no per-row k-struct array allocation);
    * the CentroidBest parity spec pins best/best2 ≡ array_min /
    * sorted-slice over THIS array, which is what keeps the fused form
    * honest. Negation is exact (sign-bit flip), so ties and orderings
    * agree bitwise with the oracle's un-negated DESC sort. */
  private[graft] def centStructs(cents: Seq[(Long, Seq[Double])]): org.apache.spark.sql.Column =
    // One native loop over the centroid matrix ([[graft.functions
    // .CentroidScores]]) — the unrolled per-centroid cosine_sim form
    // blew past HotSpot's 8000-byte method limit at scale-aware nlist
    // and deoptimized to interpreted bytecode (q30 0.39 → 1.4 s).
    // Scores and struct shape are bit-identical to the unrolled form.
    graft.functions.CentroidScores.centroid_negcos(cents, col("v"))

  /** q30 — IVF approximate nearest neighbor over TRAINED coarse
    * centroids: the [[ivfNlist]] cells come from q77's Lloyd training
    * ([[trainedCentroids]] — trained once per corpus, reused across
    * the index family, exactly how an ANN index is built then
    * served); every vector is assigned to its nearest centroid; a
    * query probes only its own centroid's posting list.
    *
    * 100 TB shape, all three legs deliberate: (1) assignment is a
    * pure NARROW map over centroid literals ([[centStructs]] argmax —
    * no k×N join, no per-vector window, ZERO corpus shuffles; the
    * r7 plan audit caught the previous window formulation exchanging
    * the corpus twice); (2) the probe side re-derives from a second,
    * vec_id-PRUNED scan (the probe filter reaches parquet) and
    * BROADCASTS onto the posting lists — never a shuffle join on the
    * nlist-valued cluster key, which would cap reducer parallelism
    * at nlist; (3) the per-query head is a WindowGroupLimit-bounded
    * top-k. A probe touches 1/nlist of the corpus, and the index
    * build cost (iters+1 scans) amortizes over every query served.
    * PlanShapeSpec pins all three. */
  def q30(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = trainedCentroids(spark, sfDir)
    val n = cvecs(spark, sfDir)
    // posting lists served from the ivf-assign family index (one
    // assignment pass per corpus, not one per consumer query)
    val assigned = ivfAssignIndex(spark, sfDir)
    val queries = n.filter(col("vec_id") >= 8 && col("vec_id") < 28)
      .withColumn("best",
        graft.functions.CentroidBest.centroid_negcos_best(cents, col("v")))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("best.c_id").as("cluster"))
    val wTop = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(queries), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("v")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cluster").cast("long").as("cluster"))
      .orderBy("q_id", "rank")
  }

  /** q132 probe width: each query searches its 2 nearest centroids'
    * posting lists instead of 1. */
  private val NProbe = 2

  /** q132 — multi-probe IVF (nprobe = 2): the standard ANN
    * recall-vs-cost knob q30's single-probe path lacks. A query whose
    * true neighbors straddle a Voronoi boundary misses them under
    * nprobe = 1 (the dominant IVF error mode); probing the 2 nearest
    * centroids' lists recovers exactly those — at 2/nlist of the
    * corpus touched instead of 1/nlist. OperatorSpec pins the
    * semantics: q132's recall vs the q29 brute-force truth is ≥
    * q30's, with everything else identical. Cells are q77's trained
    * centroids ([[trainedCentroids]]), shared with q30.
    *
    * Scale shape: identical to q30 — centroids broadcast twice (the
    * assignment argmax and the probe-list rank), the corpus streams
    * once per stage with the codegen'd cosine, the probe fan-out
    * multiplies only the QUERY side (×nprobe), and the final head is
    * a per-query window over O(queries × lists) candidates. Same
    * narrow-argmax / pruned-probe-scan / broadcast-join legs as q30
    * (see its scaladoc); the only delta is the probe side keeping
    * its [[NProbe]] best cells via array_min + best-excluded
    * array_min (the q143 form; selection ≡ the sorted prefix). */
  def q132(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = trainedCentroids(spark, sfDir)
    val n = cvecs(spark, sfDir)
    val assigned = ivfAssignIndex(spark, sfDir)
    // queries keep their nprobe nearest centroids — the only change
    // from q30, and it multiplies the query side alone
    val queries = n.filter(col("vec_id") >= 8 && col("vec_id") < 28)
      // top-2 via the fused in-loop selection (CentroidBest best2),
      // never array_sort + slice: the full sort is O(nlist log nlist)
      // struct comparisons per probe row where only the 2 best cells
      // are needed (measured 3.84 → 0.66 s serve at sf1's nlist=313).
      // Selection identical: (negcos, c_id) order ≡ sorted[0],
      // sorted[1] ≡ the oracle's row_number ranks 1 and 2.
      .withColumn("b2",
        graft.functions.CentroidBest.centroid_negcos_best2(cents, col("v")))
      .select(col("vec_id").as("q_id"), col("v").as("qv2"),
        explode(col("b2.c_id")).as("cluster"))
    val wTop = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(queries), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine_sim(col("qv2"), col("v")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  val q132Sql: String =
    s"""WITH nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |${kmeansCtesSql("nv")},
       |n AS (
       |  SELECT vec_id, v, nrm FROM (
       |    SELECT vec_id, v,
       |      sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
       |    FROM nv) t0
       |  WHERE nrm > 0),
       |cent AS (SELECT c_id, cv AS qv,
       |    sqrt(list_aggregate(list_transform(cv, x -> x * x), 'sum')) AS qn
       |  FROM c$KmeansIters),
       |ranked AS (
       |  SELECT n.vec_id, n.v, n.nrm, cent.c_id,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY list_inner_product(cent.qv, n.v) / (cent.qn * n.nrm) DESC,
       |               cent.c_id) AS rk
       |  FROM n, cent),
       |assigned AS (
       |  SELECT vec_id, v, nrm, c_id AS cluster FROM ranked WHERE rk = 1),
       |queries AS (
       |  SELECT vec_id AS q_id, v AS qv2, nrm AS qn2, c_id AS cluster
       |  FROM ranked WHERE rk <= $NProbe AND vec_id >= 8 AND vec_id < 28)
       |SELECT q_id, rank, neighbor_id FROM (
       |  SELECT q.q_id, a.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_inner_product(q.qv2, a.v) / (q.qn2 * a.nrm) DESC,
       |               a.vec_id) AS rank
       |  FROM assigned a JOIN queries q ON a.cluster = q.cluster
       |  WHERE a.vec_id <> q.q_id) t
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  val q30Sql: String =
    s"""WITH nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |${kmeansCtesSql("nv")},
       |n AS (
       |  SELECT vec_id, v, nrm FROM (
       |    SELECT vec_id, v,
       |      sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
       |    FROM nv) t0
       |  WHERE nrm > 0),
       |cent AS (SELECT c_id, cv AS qv,
       |    sqrt(list_aggregate(list_transform(cv, x -> x * x), 'sum')) AS qn
       |  FROM c$KmeansIters),
       |assigned AS (
       |  SELECT vec_id, v, nrm, c_id AS cluster FROM (
       |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(cent.qv, n.v) / (cent.qn * n.nrm) DESC,
       |                 cent.c_id) AS rk
       |    FROM n, cent) t
       |  WHERE rk = 1
       |), queries AS (
       |  SELECT vec_id AS q_id, v AS qv, nrm AS qn, cluster
       |  FROM assigned WHERE vec_id >= 8 AND vec_id < 28
       |)
       |SELECT q_id, rank, neighbor_id, cluster FROM (
       |  SELECT q.q_id, a.vec_id AS neighbor_id,
       |    CAST(a.cluster AS BIGINT) AS cluster,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_inner_product(q.qv, a.v) / (q.qn * a.nrm) DESC,
       |               a.vec_id) AS rank
       |  FROM assigned a JOIN queries q ON a.cluster = q.cluster
       |  WHERE a.vec_id <> q.q_id) t
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate threshold. The corpus has no
    * planted exact duplicates (max pairwise cos ≈ 0.51 at sf0.01);
    * 0.4 marks the measurably-correlated tail (59 pairs at sf0.01,
    * 920 at sf0.1). `private[graft]`: the streaming near-dup twin
    * (streaming/VectorStreams) enforces the same threshold. */
  private[graft] val NearDupCos = 0.4

  /** q36 verifier-tier size cap (r11 verdict item 6): above this
    * corpus size the exact all-pairs truth runs on a DETERMINISTIC
    * md5-bucket sample of ~this many vectors instead of the full
    * corpus — the q50 sampling discipline applied to the verifier so
    * its quadratic is bounded by a constant at every scale (at the
    * sf1 decade the uncapped form was 66 s, ×89; capped it is the
    * sf0.1 cell's cost forever). Keep iff
    * bucket(vec_id)·N < 65536·cap, where bucket = the first 4 md5
    * hex digits as an integer — one uniform integer rule, no
    * branching: for N ≤ cap every bucket qualifies (the driver
    * fixtures sf0.001–0.1 are all full-corpus, so their outputs are
    * byte-identical to the uncapped form), and past it the expected
    * sample size is the cap regardless of N. Pure integer
    * arithmetic; the oracle recomputes it from count(*)
    * ([[ivfNlist]]'s discipline). The recall pins that read q36 as
    * truth therefore read SAMPLED truth above the cap — an unbiased
    * recall estimator over ~cap²/2 pairs, the honest large-scale
    * posture (the alternative, full truth, is the ×89 cell the r11
    * verdict retired). */
  private[graft] val VerifierSampleCap = 4096L

  /** q36 — embedding-cosine near-dup, exact: every unordered pair
    * with cosine ≥ threshold among the verifier-tier vectors (the
    * FULL corpus up to [[VerifierSampleCap]]; a deterministic
    * md5-bucket sample of ~cap vectors past it). VERIFIER tier:
    * inherently all-pairs (O(min(N, cap)²) flops), registered
    * strictly as the ground truth that q37's recall is measured
    * against (OperatorSpec pins q37 ⊆ co-cell q36 and recall ≥ 0.8)
    * — never the operator to run on a full corpus; the scale path is
    * q37/q54's cell-scoped banded LSH. One side broadcasts, the
    * corpus streams once, and the native cosine keeps the pair loop
    * inside WholeStageCodegen. */
  def q36(spark: SparkSession, sfDir: String): DataFrame = {
    val all = cvecs(spark, sfDir)
    // One count against the (cheap, pruned) corpus scan — the
    // ivfNlist posture: a driver-side integer both engines rederive.
    val nTotal = all.count()
    val n = all.filter(
      expr("CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 4), 16, 10) AS BIGINT)")
        * lit(nTotal) < lit(65536L * VerifierSampleCap))
    val b = n.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    n.select(col("vec_id").as("vec_a"), col("v").as("va"))
      .join(broadcast(b), col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine_sim(col("va"), col("vb")))
      .filter(col("cos") >= NearDupCos)
      .select(col("vec_a"), col("vec_b"), graft.functions.OracleRound.floorRound(col("cos"), 6).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  val q36Sql: String =
    s"""WITH $normedSql,
       |nc AS (SELECT count(*) AS nt FROM n),
       |ns AS (
       |  SELECT n.* FROM n, nc
       |  WHERE ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 4))::BIGINT
       |        * nc.nt < 65536 * $VerifierSampleCap)
       |SELECT vec_a, vec_b, floor(cos * 1000000 + 0.5) / 1000000 AS cos FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    list_inner_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
       |  FROM ns a JOIN ns b ON a.vec_id < b.vec_id) t
       |WHERE cos >= $NearDupCos
       |ORDER BY vec_a, vec_b""".stripMargin

  import graft.functions.DotProduct.dot_product

  /** SRP-LSH geometry: 48 hyperplanes as 12 bands × 4 bits.
    *
    * The exploratory-threshold caveat, from the collision math: a
    * cos-0.4 pair agrees with a random hyperplane w.p.
    * 1−acos(0.4)/π ≈ 0.63 vs 0.50 for orthogonal pairs, so at this
    * corpus's exploratory threshold no (bits, bands) setting is
    * simultaneously high-recall and highly selective (measured
    * sweep, GLOBAL banding: 16 planes → recall 0.47 @ 24% of
    * all-pairs; 48 planes → 0.85 @ 54%; 120 planes → 0.36 @ 7%).
    * The r11 sf1 decade priced that diagnostic sweep's 48-plane
    * point as a registered cell: 93 s, ×64 — banding alone is NOT
    * the scale path at cos 0.4, and the sweep stays documented here
    * as a diagnostic, not benchmarked (r11 verdict item 1).
    *
    * The REGISTERED q37/q54 candidate stage is therefore
    * CELL-SCOPED ([[lshCandidates]]): band signatures collide only
    * within a vector's IVF Voronoi cell (the SemDeDup bounding,
    * served by the `ivf-assign` family index), so bucket sizes are
    * bounded by E|cell| ≈ [[IvfTargetCell]] regardless of how
    * non-selective the bands are, and total candidate volume stays
    * ∝ N at every scale. At a production near-dup threshold
    * (cos ≥ 0.9, p_bit ≈ 0.86) the banding itself is sharp — 16-bit
    * bands × 4 give recall ≈ 0.93 at a ~2⁻¹¹ random collision rate,
    * the q172 media-tower geometry — and the same cell-scoped plan
    * only gets cheaper. */
  private val NumPlanes = 48
  private val BandBits = 4 // 12 bands × 4 bits

  /** Deterministic ±1 random-hyperplane matrix, derived from md5 so
    * the DuckDB oracle recomputes the identical planes: component
    * (p, d) is +1 iff the first hex nibble of md5("p_d") ≥ 8. */
  private lazy val planes: IndexedSeq[Array[Double]] =
    (0 until NumPlanes).map { p =>
      Array.tabulate(64) { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"${p}_${d}".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
      }
    }

  /** Banded SRP signature expansion — the SHARED definition behind
    * the batch candidate stage ([[lshCandidates]]) and the streaming
    * near-dup twin (streaming/VectorStreams.nearDupPairStream): input
    * must expose `v: array<double>`; output carries the `keep`
    * columns plus one (band_idx, band_val) row per band. One
    * definition, so batch and stream cannot band, plane, or hash
    * differently (the chunkSigs precedent). */
  private[graft] def bandSigs(df: DataFrame, keep: Seq[String]): DataFrame =
    // Native banding loop ([[graft.functions.SrpBands]]): the
    // previous 48 unrolled dot_product/CASE columns put the generated
    // method near HotSpot's huge-method limit (the q172/64-plane
    // variant measurably crossed it and ran interpreted); the loop
    // form emits bit-identical (band_idx, band_val) rows at constant
    // bytecode size.
    df.select(keep.map(col) :+
      posexplode(graft.functions.SrpBands.srp_bands(
        planes.map(_.toSeq), BandBits, col("v")))
        .as(Seq("band_idx", "band_val")): _*)

  /** Candidate (vec_a, vec_b) pairs from the CELL-SCOPED banded SRP
    * signature self-join — the sub-quadratic stage shared by q37 and
    * q54. Signatures come from the `ivf-assign` posting relation
    * (vector + its Voronoi cell); the self-join key is
    * (cluster, band_idx, band_val), so a bucket can never exceed its
    * cell — candidate volume is Σ_cells Σ_bands |bucket|² ≲
    * bands · Σ|cell|²/2^bits ∝ N under the scale-aware [[ivfNlist]]
    * (E|cell| ≈ 64), where the r11-measured GLOBAL banding at this
    * exploratory threshold was ×64 superlinear (see [[NumPlanes]]).
    * Never an all-pairs product. Codegen'd self-join on the band key
    * (the collect_list + pair-expansion alternative is
    * CodegenFallback and measured ~3× slower here; the projection
    * subtree is cheap — NumPlanes native dot products over the
    * already-persisted index — so caching the tiny signature and
    * joining wins). Cache lifetime: the persisted signature
    * (O(N · bands) rows of three longs — negligible next to the
    * corpus) registers with [[graft.functions.CacheScope]] and is
    * released by the harness's per-query `CacheScope.drain()`;
    * library callers running many queries in one session should
    * drain the same way. */
  private def lshCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = bandSigs(ivfAssignIndex(spark, sfDir), Seq("vec_id", "cluster"))
      .scopedCache
    sig.count() // eager materialization — both join sides read the cache
    // NOT distinct: a pair colliding in k bands appears k times.
    // Deduplicating here would shuffle the full candidate stream
    // (its largest intermediate); callers instead dedup AFTER their
    // cheap codegen'd exact-cosine filter, when the stream has
    // shrunk to O(true pairs) — measured faster at sf0.1 and the
    // same trade at 100 TB (k ≤ bands duplicate flops vs a
    // candidate-volume shuffle).
    sig.select(col("cluster"), col("band_idx"), col("band_val"), col("vec_id").as("vec_a"))
      .join(sig.select(col("cluster"), col("band_idx"), col("band_val"), col("vec_id").as("vec_b")),
        Seq("cluster", "band_idx", "band_val"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
  }

  /** q37 — embedding near-dup via CELL-SCOPED sign-random-projection
    * LSH (the scale path for q36): every vector is assigned to its
    * IVF Voronoi cell (the `ivf-assign` family index — SemDeDup's
    * bounding, Abbas et al. 2023); within a cell, 48 deterministic
    * ±1 hyperplane projections → 48 sign bits → 12 bands × 4 bits,
    * and vectors sharing a (cell, band) signature are candidates
    * ([[lshCandidates]]); exact cosine then keeps true pairs. The
    * output is exactly the banded subset of q133's co-cell pair set
    * (and therefore of q36's global truth — no false positives
    * ever); OperatorSpec pins both subset properties and the
    * measured recall vs the co-cell truth (≥ 0.8). This is the r11
    * verdict's re-registration: the former GLOBAL banding at this
    * exploratory threshold was mathematically non-selective (the
    * [[NumPlanes]] collision math) and measured ×64 at the sf1
    * decade; cell scoping bounds every bucket by its cell, so the
    * same geometry is ∝ N at any scale. The candidate→vector fetch
    * joins read the posting relation itself (the index carries `v`)
    * and stay deliberately UNHINTED: the vector side is the FULL
    * corpus — a forced broadcast of it is the driver-OOM-at-100TB
    * class (the q154/q163 lesson) — so AQE broadcasts it only while
    * its measured size fits, and degrades to a shuffle join keyed on
    * vec_id otherwise (plan-pinned). Everything downstream of the
    * deterministic planes and the deterministic Lloyd cells is
    * exact, so the oracle reproduces it. */
  def q37(spark: SparkSession, sfDir: String): DataFrame = {
    val n = ivfAssignIndex(spark, sfDir)
    lshCandidates(spark, sfDir)
      .join(n.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(n.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .withColumn("cos", cosine_sim(col("va"), col("vb")))
      .filter(col("cos") >= NearDupCos)
      .select(col("vec_a"), col("vec_b"), graft.functions.OracleRound.floorRound(col("cos"), 6).as("cos"))
      .distinct() // collapse multi-band duplicates (post-filter: tiny)
      .orderBy("vec_a", "vec_b")
  }

  /** SQL twin of the `ivf-assign` posting relation: the q133-proven
    * trained-centroid assignment chain ending in
    * `assigned(vec_id, v, nrm, cluster)` — the oracle's copy of the
    * family index, shared by q37Sql and q54Sql. */
  private lazy val ivfAssignedSql: String =
    s"""nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |${kmeansCtesSql("nv")},
       |n AS (
       |  SELECT vec_id, v, nrm FROM (
       |    SELECT vec_id, v,
       |      sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
       |    FROM nv) t0
       |  WHERE nrm > 0),
       |cent AS (SELECT c_id, cv AS qv,
       |    sqrt(list_aggregate(list_transform(cv, x -> x * x), 'sum')) AS qn
       |  FROM c$KmeansIters),
       |assigned AS (
       |  SELECT vec_id, v, nrm, c_id AS cluster FROM (
       |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(cent.qv, n.v) / (cent.qn * n.nrm) DESC,
       |                 cent.c_id) AS rk
       |    FROM n, cent) t
       |  WHERE rk = 1)""".stripMargin

  /** SQL twin of [[lshCandidates]] (depends on the `assigned` CTE
    * from [[ivfAssignedSql]]) — shared by q37Sql and q54Sql. The
    * band self-join carries the cluster key, so candidates are
    * co-cell by construction. */
  private lazy val lshCandSql: String =
    s"""planes AS (
       |  SELECT p.p AS p, d.d AS d,
       |    CASE WHEN substring(md5(CAST(p.p AS VARCHAR) || '_' || CAST(d.d AS VARCHAR)), 1, 1) >= '8'
       |         THEN 1.0 ELSE -1.0 END AS s
       |  FROM range($NumPlanes) p(p), range(64) d(d)
       |), pl AS (
       |  SELECT p, list(s ORDER BY d) AS sv FROM planes GROUP BY p
       |), bits AS (
       |  SELECT a.vec_id, a.cluster, pl.p,
       |    CASE WHEN list_inner_product(a.v, pl.sv) >= 0 THEN '1' ELSE '0' END AS bit
       |  FROM assigned a, pl
       |), sig AS (
       |  SELECT vec_id, cluster, p // $BandBits AS band_idx,
       |    string_agg(bit, '' ORDER BY p) AS band_val
       |  FROM bits GROUP BY vec_id, cluster, p // $BandBits
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM sig a JOIN sig b
       |    ON a.cluster = b.cluster
       |   AND a.band_idx = b.band_idx AND a.band_val = b.band_val
       |   AND a.vec_id < b.vec_id
       |)""".stripMargin

  lazy val q37Sql: String =
    s"""WITH $ivfAssignedSql,
       |$lshCandSql
       |SELECT vec_a, vec_b, floor(cos * 1000000 + 0.5) / 1000000 AS cos FROM (
       |  SELECT vec_a, vec_b,
       |    list_inner_product(na.v, nb.v) / (na.nrm * nb.nrm) AS cos
       |  FROM cand
       |  JOIN n na ON na.vec_id = vec_a
       |  JOIN n nb ON nb.vec_id = vec_b) t
       |WHERE cos >= $NearDupCos
       |ORDER BY vec_a, vec_b""".stripMargin

  /** q54 — the composed embedding pipeline: near-dup removal (drop
    * the higher id of every candidate pair with exact cosine ≥
    * threshold, where candidates come from the CELL-SCOPED banded
    * SRP-LSH join — [[lshCandidates]], q37's stage) → IVF coarse
    * assignment of the survivors (q30's shape, centroids = surviving
    * ids < 8) → per-cluster inventory. This IS the 100 TB shape
    * end-to-end: the dedup stage shuffles band signatures within
    * Voronoi cells (sub-quadratic with cell-bounded buckets — the
    * r11 re-registration; the former global banding measured ×64 at
    * the sf1 decade), exact cosine runs only on candidates, and the
    * output is the partition histogram an ANN index build needs
    * (skewed clusters ⇒ re-train centroids). The dedup is
    * recall-bounded exactly as q37 is (vs the co-cell truth — see
    * [[NumPlanes]]); the oracle reproduces the identical candidate
    * set, so the comparison stays bit-exact. */
  def q54(spark: SparkSession, sfDir: String): DataFrame = {
    val n = ivfAssignIndex(spark, sfDir).select(col("vec_id"), col("v"))
    val dupIds = lshCandidates(spark, sfDir)
      // UNHINTED like q37's fetch joins: the vector side is the full
      // corpus; AQE broadcasts while it fits, shuffles on vec_id past
      // that — never a forced driver broadcast of corpus bytes.
      .join(n.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(n.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .filter(cosine_sim(col("va"), col("vb")) >= NearDupCos)
      .select(col("vec_b").as("vec_id")).distinct()
    val survivors = n.join(dupIds, Seq("vec_id"), "left_anti")
    val cent = survivors.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("c_id"))
    survivors.join(broadcast(cent), lit(true))
      .withColumn("cos", cosine_sim(col("cv"), col("v")))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .groupBy(col("c_id").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        min("vec_id").as("min_vec"), max("vec_id").as("max_vec"))
      .orderBy("cluster")
  }

  lazy val q54Sql: String =
    s"""WITH $ivfAssignedSql,
       |$lshCandSql,
       |dups AS (
       |  SELECT DISTINCT nb.vec_id FROM cand
       |  JOIN n na ON na.vec_id = cand.vec_a
       |  JOIN n nb ON nb.vec_id = cand.vec_b
       |  WHERE list_inner_product(na.v, nb.v) / (na.nrm * nb.nrm) >= $NearDupCos
       |), survivors AS (
       |  SELECT * FROM n WHERE vec_id NOT IN (SELECT vec_id FROM dups)
       |), scent AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM survivors WHERE vec_id < 8
       |), sassigned AS (
       |  SELECT vec_id, c_id FROM (
       |    SELECT s.vec_id, scent.c_id,
       |      row_number() OVER (PARTITION BY s.vec_id
       |        ORDER BY list_inner_product(scent.cv, s.v) / (scent.cn * s.nrm) DESC,
       |                 scent.c_id) AS rk
       |    FROM survivors s, scent) t
       |  WHERE rk = 1
       |)
       |SELECT CAST(c_id AS BIGINT) AS cluster, count(*) AS n_vectors,
       | min(vec_id) AS min_vec, max(vec_id) AS max_vec
       |FROM sassigned GROUP BY c_id ORDER BY cluster""".stripMargin

  /** q133 — SemDeDup (cluster-then-dedup semantic deduplication, the
    * Abbas et al. 2023 recipe): assign every vector to its nearest
    * TRAINED centroid ([[trainedCentroids]] — the same k-means cells
    * the IVF family serves), run exact pairwise cosine only WITHIN
    * each cluster, and drop the higher vec_id of every pair at the
    * family's [[NearDupCos]] threshold. Output is the per-cluster
    * dedup report (members / dup pairs / dropped / kept).
    *
    * Semantics vs the rest of the dedup family: q36 is the global
    * all-pairs truth (verifier, small-N only), q37 approximates it
    * with banded SRP-LSH; SemDeDup instead bounds the quadratic term
    * by CLUSTER — only co-clustered pairs are ever compared, so it
    * finds exactly the subset of q36's pairs whose endpoints share a
    * Voronoi cell (measured 29/59 at sf0.01, 323/920 at sf0.1;
    * OperatorSpec pins the subset property and the recall floor).
    *
    * 100 TB shape: the assignment leg is q30's narrow argmax — zero
    * corpus shuffles, centroid literals broadcast. The intra-cluster
    * self-join shuffles the corpus ONCE on the cluster key; total
    * pairwise flops are Σ|cell|² ≈ N²/k, the SemDeDup trade (k grows
    * with N in production — 50k cells in the paper — keeping E|cell|
    * bounded, so the per-cell all-pairs stays a local nested loop).
    * nlist now SCALES with the corpus ([[ivfNlist]]: E|cell| ≈ 64),
    * so Σ|cell|² stays ∝ N instead of N²/8, reducer parallelism
    * grows with the data, and a skewed mega-cell is exactly what
    * q54's inventory flags for re-training. */
  def q133(spark: SparkSession, sfDir: String): DataFrame = {
    // 3 consumers (both self-join sides + the membership rollup) all
    // read the persisted ivf-assign family index — the argmax
    // assignment runs once per corpus, not three times per query.
    val assigned = ivfAssignIndex(spark, sfDir)
    val dupPairs = assigned
      .select(col("cluster"), col("vec_id").as("vec_a"), col("v").as("va"))
      .join(assigned.select(col("cluster"), col("vec_id").as("vec_b"),
        col("v").as("vb")), Seq("cluster"))
      .filter(col("vec_a") < col("vec_b") &&
        cosine_sim(col("va"), col("vb")) >= NearDupCos)
      .select(col("cluster"), col("vec_a"), col("vec_b"))
      .scopedCache
    dupPairs.count()
    val drops = dupPairs.select(col("vec_b").as("vec_id")).distinct()
      .withColumn("dropped", lit(1))
    val memberStats = assigned.join(drops, Seq("vec_id"), "left")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"), count(col("dropped")).as("n_dropped"))
    val pairCounts = dupPairs.groupBy("cluster")
      .agg(count(lit(1)).as("n_dup_pairs"))
    memberStats.join(pairCounts, Seq("cluster"), "left")
      .select(col("cluster").cast("long").as("cluster"),
        col("n_members"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        col("n_dropped"),
        (col("n_members") - col("n_dropped")).as("n_kept"))
      .orderBy("cluster")
  }

  val q133Sql: String =
    s"""WITH nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |${kmeansCtesSql("nv")},
       |n AS (
       |  SELECT vec_id, v, nrm FROM (
       |    SELECT vec_id, v,
       |      sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
       |    FROM nv) t0
       |  WHERE nrm > 0),
       |cent AS (SELECT c_id, cv AS qv,
       |    sqrt(list_aggregate(list_transform(cv, x -> x * x), 'sum')) AS qn
       |  FROM c$KmeansIters),
       |assigned AS (
       |  SELECT vec_id, v, nrm, c_id AS cluster FROM (
       |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(cent.qv, n.v) / (cent.qn * n.nrm) DESC,
       |                 cent.c_id) AS rk
       |    FROM n, cent) t
       |  WHERE rk = 1),
       |dup_pairs AS (
       |  SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM assigned a JOIN assigned b
       |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= $NearDupCos),
       |drops AS (SELECT DISTINCT vec_b AS vec_id FROM dup_pairs),
       |ms AS (
       |  SELECT a.cluster, count(*) AS n_members, count(d.vec_id) AS n_dropped
       |  FROM assigned a LEFT JOIN drops d ON a.vec_id = d.vec_id
       |  GROUP BY a.cluster),
       |pc AS (SELECT cluster, count(*) AS n_dup_pairs FROM dup_pairs GROUP BY cluster)
       |SELECT CAST(ms.cluster AS BIGINT) AS cluster,
       |  CAST(n_members AS BIGINT) AS n_members,
       |  CAST(coalesce(pc.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       |  CAST(n_dropped AS BIGINT) AS n_dropped,
       |  CAST(n_members - n_dropped AS BIGINT) AS n_kept
       |FROM ms LEFT JOIN pc ON ms.cluster = pc.cluster
       |ORDER BY cluster""".stripMargin

  /** q56 — array-function gauntlet over the embedding column: size,
    * element access, extrema, and the L2 norm via the native
    * dot_product expression — the per-vector feature stage (all
    * codegen'd, one narrow projection; the orderBy is presentation
    * only). */
  def q56(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.OracleRound.floorRound
    vecs(spark, sfDir)
      .select(col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        floorRound(element_at(col("v"), 1), 6).as("first_val"),
        floorRound(array_min(col("v")), 6).as("vmin"),
        floorRound(array_max(col("v")), 6).as("vmax"),
        floorRound(sqrt(dot_product(col("v"), col("v"))), 6).as("l2_norm"))
      .orderBy("vec_id")
  }

  val q56Sql: String =
    s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |  WHERE len(embedding) = $Dim)
      |SELECT vec_id,
      | CAST(len(v) AS BIGINT) AS dim,
      | floor(v[1] * 1000000 + 0.5) / 1000000 AS first_val,
      | floor(list_aggregate(v, 'min') * 1000000 + 0.5) / 1000000 AS vmin,
      | floor(list_aggregate(v, 'max') * 1000000 + 0.5) / 1000000 AS vmax,
      | floor(sqrt(list_inner_product(v, v)) * 1000000 + 0.5) / 1000000 AS l2_norm
      |FROM n ORDER BY vec_id""".stripMargin

  /** q58 — k-NN under the Euclidean metric (native l2_distance
    * expression): top-5 nearest for each of the 20 probe vectors —
    * the L2 twin of the cosine search (q29), same broadcast-probe /
    * single-corpus-scan / per-query-top-k shape. Ranks compared
    * (distance ties broken by vec_id), distances not emitted. */
  def q58(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.EuclideanDistance.l2_distance
    val n = vecs(spark, sfDir)
    val q = n.select(col("vec_id").as("q_id"), col("v").as("qv"))
      .filter(col("q_id") < 20)
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("vec_id"))
    n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("dist", l2_distance(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  val q58Sql: String =
    s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |  WHERE len(embedding) = $Dim),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM n WHERE vec_id < 20),
      |pairs AS (
      |  SELECT q_id, vec_id, list_distance(qv, v) AS dist
      |  FROM q, n WHERE vec_id <> q_id
      |)
      |SELECT q_id, rank, neighbor_id FROM (
      |  SELECT q_id, vec_id AS neighbor_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rank
      |  FROM pairs) t
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** q77 — k-means (Lloyd's) over the embedding corpus: the TRAINED
    * centroid path the IVF index serves (q30/q132 consume exactly
    * these cells via [[trainedCentroids]] — SURVEY §2.6 flags this
    * re-train step). The loop is [[lloydTrain]]; at 100 TB the
    * per-iteration cost is one scan + one k·d-sized shuffle; nothing
    * grows with N except the scans. Always re-trains (this IS the
    * training benchmark) and refreshes the shared memo with the
    * identical deterministic value. */
  def q77(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.OracleRound.{floorRound, exactSum}
    // No corpus persist (r12): with the in-driver training loop every
    // corpus consumer here — the count, the seed/sample collects, the
    // final assignment scan — reads the relation exactly once, so a
    // persist is pure materialization cost locally and corpus-pinned
    // memory at 100 TB (the q68 no-corpus-cache lesson).
    val n = vecs(spark, sfDir)
    val cent = lloydTrain(n, n.count())
    centroidMemo.put(graft.sources.Tables.fingerprint(sfDir, Seq("embeddings")), cent)
    assignL2(n, cent)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        floorRound(exactSum(col("dist")), 4).as("cost"))
      .orderBy("cluster")
  }

  /** Unrolled-iteration twin of [[q77]] — generated from the same
    * (k, iters) constants via [[kmeansCtesSql]] so the training
    * query and the IVF oracles can never drift. */
  val q77Sql: String = {
    import graft.functions.OracleRound.{floorRoundSql, exactSumSql}
    s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |${kmeansCtesSql("n")},
       |fin AS (SELECT vec_id, cluster, dist FROM (
       |  SELECT n.vec_id, c.c_id AS cluster, list_distance(c.cv, n.v) AS dist,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY list_distance(c.cv, n.v), c.c_id) AS rk
       |  FROM n, c$KmeansIters c) t WHERE rk = 1)
       |SELECT cluster, count(*) AS n_vecs,
       |  ${floorRoundSql(exactSumSql("dist"), 4)} AS cost
       |FROM fin GROUP BY cluster ORDER BY cluster""".stripMargin
  }

  /** The BASE slice for the incremental-maintenance family: the
    * vectors that existed when the index was trained (vec_id % 10
    * < 8 — a deterministic 80% cut; the arriving 20% are the "new"
    * vectors an online ingest appends after index build).
    *
    * Seed-count note (r11 advice): [[lloydTrain]] seeds
    * vec_id < [[ivfNlist]](count), and this slice excludes ids
    * ≡ 8,9 (mod 10), so the maintenance trainer actually starts from
    * ~0.8·nlist seeds — the trained cell count lands ≈ 0.8·nominal
    * and E|cell| ≈ 80 rather than the family's 64 target. ACCEPTED
    * as-is: engine and oracle compute the identical seed set (both
    * apply the same `< k` rule to the same slice — the q168/q170
    * oracles' seed CTE carries the slice predicate), the
    * maintenance family's purpose is drift DETECTION (cell-count
    * slack changes no verdict), and re-seeding from the first k ids
    * PRESENT in the slice would buy back the 20% at the cost of a
    * rank-over-slice pass in every oracle twin. Revisit only if a
    * consumer starts caring about the absolute cell-size target. */
  private def baseVecs(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir).filter(col("vec_id") % 10 < 8)

  /** Centroids trained on the BASE slice only — the
    * [[trainedCentroids]] memo discipline (fingerprint-keyed driver
    * values, O(k·d) doubles) with a distinct key suffix so the
    * full-corpus entry and the base-slice entry never alias. */
  private[graft] def maintCentroids(spark: SparkSession, sfDir: String): Seq[(Long, Seq[Double])] = {
    val key = graft.sources.Tables.fingerprint(sfDir, Seq("embeddings")) + ":base"
    centroidMemo.computeIfAbsent(key, _ => {
      // No persist — see [[trainedCentroids]] (r12).
      val n = baseVecs(spark, sfDir)
      lloydTrain(n, n.count())
    })
  }

  /** Training-time cell histogram (cluster → base-member count) —
    * O(k) driver rows, the static side the streaming maintenance
    * monitor compares against. */
  private[graft] def maintBaseHistogram(spark: SparkSession, sfDir: String): Seq[(Long, Long)] =
    assignL2(baseVecs(spark, sfDir), maintCentroids(spark, sfDir))
      .groupBy("cluster").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  /** q168 — incremental ANN index maintenance: the vector-side q152
    * (delta dedup) story. An IVF index is trained once on the base
    * corpus ([[maintCentroids]] — memoized, exactly how a production
    * index is built then served); vectors that arrive AFTER the build
    * are assigned to the frozen cells statelessly (the narrow
    * [[assignL2]] argmin — no join, no shuffle before the k-row
    * aggregate), and the per-cell arrival histogram is compared to
    * the training-time histogram: a cell whose share of arrivals
    * leaves [½·, 2·] its training share is flagged for retrain — the
    * drift signal an index-maintenance job acts on before recall
    * quietly degrades.
    *
    * Scale shape: ONE corpus pass (narrow argmin over k·d centroid
    * literals) into a k-row map-combined aggregate; the totals attach
    * as a 1-row broadcast; output is O(k). The drift test is exact
    * integer cross-multiplication (n_new·tb vs 2·n_base·tn), so no
    * double compare decides a flag — counts fit BIGINT up to ~10⁹
    * vectors a side; beyond that run the comparison in DECIMAL.
    * Streaming twin: [[graft.streaming.VectorStreams
    * .annMaintenanceStream]] (same assignment expression, domain-
    * bounded one-row pivot state, parity-pinned). */
  def q168(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.OracleRound.floorRound
    val cents = maintCentroids(spark, sfDir)
    val assigned = assignL2(vecs(spark, sfDir), cents)
      .withColumn("is_new", col("vec_id") % 10 >= 8)
    val agg = assigned.groupBy("cluster").agg(
      sum(when(col("is_new"), 0L).otherwise(1L)).as("n_base"),
      sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
    val tot = agg.agg(sum("n_base").as("tb"), sum("n_new").as("tn"))
    agg.crossJoin(broadcast(tot))
      .withColumn("share_base",
        floorRound(col("n_base").cast("double") / col("tb"), 6))
      .withColumn("share_new",
        floorRound(col("n_new").cast("double") / col("tn"), 6))
      .withColumn("drifted",
        when(col("n_new") * col("tb") > lit(2L) * col("n_base") * col("tn") ||
          lit(2L) * col("n_new") * col("tb") < col("n_base") * col("tn"), 1L)
          .otherwise(0L))
      .select("cluster", "n_base", "n_new", "share_base", "share_new", "drifted")
      .orderBy("cluster")
  }

  /** Twin: re-trains the base-slice centroids with the SAME unrolled
    * Lloyd chain generator as q77/q30/q132 (prefix `g` — base `bb`),
    * then replays assignment, histograms, and the integer drift
    * rule. */
  val q168Sql: String = {
    import graft.functions.OracleRound.floorRoundSql
    s"""WITH nb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |bb AS (SELECT vec_id, v FROM nb WHERE vec_id % 10 < 8),
       |${kmeansCtesSql("bb", Dim, "g")},
       |fin AS (SELECT vec_id, cluster FROM (
       |  SELECT nb.vec_id, c.c_id AS cluster,
       |    row_number() OVER (PARTITION BY nb.vec_id
       |      ORDER BY list_distance(c.cv, nb.v), c.c_id) AS rk
       |  FROM nb, gc$KmeansIters c) t WHERE rk = 1),
       |agg AS (
       |  SELECT cluster,
       |    CAST(sum(CASE WHEN vec_id % 10 >= 8 THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
       |    CAST(sum(CASE WHEN vec_id % 10 >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
       |  FROM fin GROUP BY cluster),
       |tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
       |  CAST(sum(n_new) AS BIGINT) AS tn FROM agg)
       |SELECT cluster, n_base, n_new,
       |  ${floorRoundSql("CAST(n_base AS DOUBLE) / tb", 6)} AS share_base,
       |  ${floorRoundSql("CAST(n_new AS DOUBLE) / tn", 6)} AS share_new,
       |  CAST(CASE WHEN n_new * tb > 2 * n_base * tn
       |    OR 2 * n_new * tb < n_base * tn THEN 1 ELSE 0 END AS BIGINT) AS drifted
       |FROM agg, tot ORDER BY cluster""".stripMargin
  }

  /** Per-dimension population statistics from exact DECIMAL power
    * sums, then standardized squared deviation — the same
    * shared-string + CAST-every-integer-leaf discipline as the
    * moment queries (see OracleRound and the q114 decimal-literal
    * lesson). Columns: n, s1d, s2d at stats level; x, mean, std at
    * scoring level. */
  private val dimMeanFormula = "CAST(s1d AS DOUBLE) / CAST(n AS DOUBLE)"
  // The variance is clamped at 0 before sqrt: for a (near-)constant
  // dimension the double expression can round a hair below zero, and
  // DuckDB hard-errors on sqrt(negative) (killing the whole oracle
  // query) while Spark would NaN and silently pass the std>0 filter —
  // greatest(0.0, ...) keeps the two engines on the same legal path.
  private val dimStdFormula =
    "sqrt(greatest(0.0, (CAST(s2d AS DOUBLE) - CAST(s1d AS DOUBLE) * CAST(s1d AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))"
  private val zSqFormula =
    "CAST(((x - mean) / std) * ((x - mean) / std) AS DECIMAL(28,12))"

  /** How many outlier vectors q115 reports. */
  private val OutlierTopK = 20

  /** q115 — embedding-space outlier detection by diagonal Mahalanobis
    * distance: standardize every dimension against the corpus
    * (per-dim mean/std), score each vector by Σ z² over its
    * dimensions, report the top-k — the vector-quality screen run
    * before ANN indexing or clustering, where a handful of corrupt /
    * out-of-distribution embeddings poison centroids and recall.
    *
    * Scale shape: the per-dimension moment table is O(dim) rows built
    * from one map-side-combined aggregate over the exploded corpus
    * (mergeable DECIMAL power sums — bit-identical across any
    * partition tree), and BROADCASTS back onto a second narrow pass;
    * per-vector scoring is a doc-local DECIMAL sum; the report is a
    * TakeOrdered. Nothing shuffles but the two aggregates. Constant
    * dimensions (std = 0) are excluded on both engines rather than
    * dividing by zero. */
  def q115(spark: SparkSession, sfDir: String): DataFrame = {
    def exploded = Tables.embeddings(spark, sfDir)
      // Dimension contract made explicit: the engine's posexplode
      // emits size(embedding) rows while the oracle's generate_series
      // always emits Dim — a NULL or ragged vector would diverge the
      // two silently. Both sides therefore pin len = Dim.
      .filter(size(col("embedding")) === Dim)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos0", "x")))
      .select(col("vec_id"), (col("pos0") + 1).cast("long").as("pos"), col("x"))
    val stats = exploded.groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,12)")).as("s1d"),
        sum((col("x") * col("x")).cast("decimal(28,12)")).as("s2d"))
      .select(col("pos"), expr(dimMeanFormula).as("mean"),
        expr(dimStdFormula).as("std"))
      .filter(col("std") > 0.0)
    exploded.join(broadcast(stats), "pos")
      .withColumn("zz", expr(zSqFormula))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_dims"),
        graft.functions.OracleRound.floorRound(
          sum(col("zz")).cast("double"), 6).as("md2"))
      .orderBy(col("md2").desc, col("vec_id"))
      .limit(OutlierTopK)
  }

  val q115Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
       |  FROM embeddings, (SELECT unnest(generate_series(1, $Dim)) AS i) p
       |  WHERE len(embedding) = $Dim),
       |stats0 AS (
       |  SELECT pos, count(*) AS n,
       |    sum(CAST(x AS DECIMAL(28,12))) AS s1d,
       |    sum(CAST(x * x AS DECIMAL(28,12))) AS s2d
       |  FROM e GROUP BY pos),
       |stats AS (
       |  SELECT pos, $dimMeanFormula AS mean, $dimStdFormula AS std
       |  FROM stats0),
       |z AS (
       |  SELECT e.vec_id, $zSqFormula AS zz
       |  FROM e JOIN stats s ON e.pos = s.pos WHERE s.std > 0.0)
       |SELECT vec_id, count(*) AS n_dims,
       |  ${floorRoundSql("CAST(sum(zz) AS DOUBLE)", 6)} AS md2
       |FROM z GROUP BY vec_id ORDER BY md2 DESC, vec_id LIMIT $OutlierTopK""".stripMargin

  /** q116 probe-set size (leave-one-out k-NN is evaluated on a fixed
    * probe subset — the probe side always broadcasts). */
  private val KnnEvalProbes = 100
  private val KnnEvalK = 5

  /** q116 — k-NN label-accuracy evaluation (leave-one-out): for each
    * probe vector, the majority label of its 5 nearest neighbors
    * (cosine, probe excluded) is compared against its own label, and
    * accuracy reports per label — the standard embedding-quality
    * probe run after (re)training an encoder: collapsing accuracy
    * means the space no longer separates the classes.
    *
    * Scale shape: identical to q29 — the probe set broadcasts, the
    * corpus streams through ONE scan with the native `cosine_sim`
    * codegen loop, the per-probe top-k window holds O(probes × k)
    * rows, and everything after (vote, accuracy) is O(probes). Ties
    * are double-deterministic: neighbor rank ties break on vec_id,
    * vote ties on (count DESC, label ASC). */
  def q116(spark: SparkSession, sfDir: String): DataFrame = {
    // Dimension contract FIRST (same as [[vecs]]): a ragged probe-side
    // vector would otherwise pass the norm filter, get all-NULL cosines
    // (cosine_sim returns NULL on length mismatch) and vote via the
    // vec_id tiebreak, while the oracle's `len(embedding) = Dim` drops
    // the probe entirely — diverging n_probes between engines.
    val n = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === Dim)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label").cast("long").as("label"))
      .filter(graft.functions.DotProduct.dot_product(col("v"), col("v")) > 0.0)
    val probes = n.filter(col("vec_id") < KnnEvalProbes)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("label").as("true_label"))
    val wNbr = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val nbrs = n.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("v")))
      .withColumn("rk", row_number().over(wNbr))
      .filter(col("rk") <= KnnEvalK)
      .select(col("q_id"), col("true_label"), col("label"))
    val wVote = Window.partitionBy("q_id")
      .orderBy(col("votes").desc, col("label"))
    val voted = nbrs.groupBy("q_id", "true_label", "label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrk", row_number().over(wVote))
      .filter(col("vrk") === 1)
    voted.groupBy("true_label")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("label") === col("true_label"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("true_label").as("label"), col("n_probes"),
        col("n_correct").cast("long").as("n_correct"),
        floorRoundCol6(col("n_correct").cast("double") / col("n_probes")).as("accuracy"))
      .orderBy("label")
  }

  private def floorRoundCol6(c: org.apache.spark.sql.Column) =
    graft.functions.OracleRound.floorRound(c, 6)

  val q116Sql: String =
    s"""WITH $normedSql,
       |probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn,
       |    CAST(label AS BIGINT) AS true_label
       |  FROM (SELECT e.vec_id, n.v, n.nrm, e.label
       |        FROM embeddings e JOIN n ON e.vec_id = n.vec_id) t
       |  WHERE q_id < $KnnEvalProbes),
       |nbrs AS (
       |  SELECT q_id, true_label, label FROM (
       |    SELECT p.q_id, p.true_label, CAST(e.label AS BIGINT) AS label,
       |      row_number() OVER (PARTITION BY p.q_id
       |        ORDER BY list_inner_product(p.qv, n.v) / (p.qn * n.nrm) DESC,
       |                 n.vec_id) AS rk
       |    FROM probes p, n JOIN embeddings e ON n.vec_id = e.vec_id
       |    WHERE n.vec_id <> p.q_id) t
       |  WHERE rk <= $KnnEvalK),
       |voted AS (
       |  SELECT q_id, true_label, label FROM (
       |    SELECT q_id, true_label, label,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY count(*) DESC, label) AS vrk
       |    FROM nbrs GROUP BY q_id, true_label, label) t
       |  WHERE vrk = 1)
       |SELECT true_label AS label, count(*) AS n_probes,
       |  CAST(sum(CASE WHEN label = true_label THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_correct,
       |  ${floorRoundSql(
          "CAST(sum(CASE WHEN label = true_label THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)}
       |    AS accuracy
       |FROM voted GROUP BY true_label ORDER BY label""".stripMargin

  /** q130 shared formula strings (the q115 discipline: every integer
    * leaf CAST to DOUBLE, population variance clamped at 0 before
    * use — a near-constant dimension can round a hair negative and
    * the two engines must stay on the same legal path). */
  private val labMeanF = "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
  private val globMeanF = "CAST(s1g AS DOUBLE) / CAST(ng AS DOUBLE)"
  private val withinDimF =
    "greatest(0.0, CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - " +
      "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))"
  private val betweenDimF = s"(($labMeanF) - ($globMeanF)) * (($labMeanF) - ($globMeanF))"

  /** q130 — per-label centroid separation (Fisher-style audit): for
    * each label, the squared distance between its centroid and the
    * global centroid (between-class scatter) against its mean
    * within-class variance summed over dimensions, and their ratio —
    * the closed-form embedding-space separability screen that
    * complements q116's k-NN accuracy (q116 measures separability
    * empirically by votes; this measures it analytically from
    * moments, so it also localizes WHICH classes collapsed after an
    * encoder retrain).
    *
    * Scale shape: ONE pass over the exploded corpus into map-combined
    * (label, pos) DECIMAL power sums — O(labels·dim) rows, eagerly
    * localCheckpoint-ed (tiny) because two consumers derive from it:
    * the per-label view and the global view (re-aggregating the SAME
    * sums, so global ≡ pooled by construction, no second corpus
    * read). Everything downstream is O(labels·dim) algebra with the
    * per-dim doubles cast to DECIMAL(28,12) before the over-dims sum
    * (order-independent — the q115 zSq pattern). */
  def q130(spark: SparkSession, sfDir: String): DataFrame = {
    val sums = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === Dim) // q115's dimension contract
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos0", "x")))
      .select(col("label"), (col("pos0") + 1).cast("long").as("pos"), col("x"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,12)")).as("s1"),
        sum((col("x") * col("x")).cast("decimal(28,12)")).as("s2"))
      .localCheckpoint(true)
      .transform(graft.functions.CacheScope.registerCheckpoint)
    val glob = sums.groupBy("pos")
      .agg(sum("n").as("ng"), sum("s1").as("s1g"))
    sums.join(broadcast(glob), "pos")
      .withColumn("b", expr(s"CAST(($betweenDimF) AS DECIMAL(28,12))"))
      .withColumn("w", expr(s"CAST(($withinDimF) AS DECIMAL(28,12))"))
      .groupBy("label")
      .agg(max("n").as("n_vecs"),
        floorRound(sum(col("b")).cast("double"), 6).as("between_sq"),
        floorRound(sum(col("w")).cast("double"), 6).as("within_var"),
        floorRound(
          when(sum(col("w")) > 0,
            sum(col("b")).cast("double") / sum(col("w")).cast("double"))
            .otherwise(lit(0.0)), 6)
          .as("fisher_ratio"))
      .orderBy("label")
  }

  val q130Sql: String =
    s"""WITH e AS (
       |  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
       |  FROM embeddings, (SELECT unnest(generate_series(1, $Dim)) AS i) p
       |  WHERE len(embedding) = $Dim),
       |sums AS (
       |  SELECT label, pos, count(*) AS n,
       |    sum(CAST(x AS DECIMAL(28,12))) AS s1,
       |    sum(CAST(x * x AS DECIMAL(28,12))) AS s2
       |  FROM e GROUP BY label, pos),
       |gstats AS (
       |  SELECT pos, sum(n) AS ng, sum(s1) AS s1g FROM sums GROUP BY pos),
       |d AS (
       |  SELECT s.label, s.n,
       |    CAST(($betweenDimF) AS DECIMAL(28,12)) AS b,
       |    CAST(($withinDimF) AS DECIMAL(28,12)) AS w
       |  FROM sums s JOIN gstats g ON s.pos = g.pos)
       |SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
       |  ${floorRoundSql("CAST(sum(b) AS DOUBLE)", 6)} AS between_sq,
       |  ${floorRoundSql("CAST(sum(w) AS DOUBLE)", 6)} AS within_var,
       |  ${floorRoundSql(
            "CASE WHEN sum(w) > 0 THEN CAST(sum(b) AS DOUBLE) / CAST(sum(w) AS DOUBLE) " +
            "ELSE 0.0 END", 6)}
       |    AS fisher_ratio
       |FROM d GROUP BY label ORDER BY label""".stripMargin

  /** q137 probe-set size and per-probe negative count (probes always
    * broadcast, like q29/q116). */
  private val HardNegProbes = 20
  private val HardNegK = 5

  /** q137 — hard-negative mining for contrastive training: for each
    * probe vector, the 5 most-cosine-similar corpus vectors carrying a
    * DIFFERENT label — the "hard" negatives a contrastive encoder or
    * reranker fine-tune pairs with each anchor (close in embedding
    * space, semantically wrong). Same-label vectors are excluded up
    * front, which also removes the probe itself.
    *
    * Scale shape: identical to q29/q116 — the probe set broadcasts,
    * the corpus streams through ONE scan with the native codegen'd
    * `cosine_sim`, and the per-probe top-k window holds only
    * O(probes × k) rows. The label inequality is a codegen'd integer
    * compare applied BEFORE the cosine, so the flop count is the
    * negative-candidate count, not probes × corpus. Dimension +
    * zero-norm contracts apply as in every cosine consumer. */
  def q137(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === Dim)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label").cast("long").as("label"))
      .filter(graft.functions.DotProduct.dot_product(col("v"), col("v")) > 0.0)
    val probes = n.filter(col("vec_id") < HardNegProbes)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("label").as("q_label"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    n.join(broadcast(probes), col("label") =!= col("q_label"))
      .withColumn("cos", cosine_sim(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= HardNegK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neg_id"),
        col("label").as("neg_label"))
      .orderBy("q_id", "rank")
  }

  val q137Sql: String =
    s"""WITH $normedSql,
       |lab AS (SELECT n.vec_id, n.v, n.nrm, CAST(e.label AS BIGINT) AS label
       |  FROM n JOIN embeddings e ON n.vec_id = e.vec_id),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, label AS q_label
       |  FROM lab WHERE vec_id < $HardNegProbes)
       |SELECT q_id, rank, neg_id, neg_label FROM (
       |  SELECT q.q_id, lab.vec_id AS neg_id, lab.label AS neg_label,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_inner_product(q.qv, lab.v) / (q.qn * lab.nrm) DESC,
       |               lab.vec_id) AS rank
       |  FROM q, lab WHERE lab.label <> q.q_label) t
       |WHERE rank <= $HardNegK ORDER BY q_id, rank""".stripMargin

  /** q143 — simplified-silhouette audit of the trained k-means index:
    * the cluster-quality number a pipeline checks BEFORE trusting the
    * IVF index (q30/q132) or SemDeDup cells (q133) built on those
    * centroids. Per vector, a = L2 distance to its own (nearest)
    * centroid and b = distance to the closest OTHER centroid; the
    * silhouette s = (b−a)/max(a,b) ∈ [0,1] here (b ≥ a by
    * construction). Reports per cluster: size, mean silhouette
    * (separation quality) and mean a (cohesion). Completes the
    * clustering lineage: train (q77) → serve (q30/q132) → dedup
    * (q133) → evaluate (q143).
    *
    * Simplified (centroid-based) rather than classical silhouette by
    * design: the classical form needs all-pairs distances (O(N²) — a
    * non-starter at corpus scale); the centroid form is the standard
    * large-scale substitute and is one NARROW pass: k centroid
    * literals broadcast in the expression, `array_sort` of (dist,
    * c_id) structs gives nearest and second-nearest in-row — zero
    * corpus shuffles before the 8-group aggregate.
    *
    * Engine-exactness: centroids are bit-identical on both sides (the
    * q77 DECIMAL-mean discipline), l2_distance ≡ list_distance
    * bitwise (pinned by q77's hash-matched cost sums), the per-row
    * division is IEEE-on-identical-bits, and the means aggregate in
    * DECIMAL(28,12) (order-independent) before one floorRound. */
  def q143(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = trainedCentroids(spark, sfDir)
    val n = vecs(spark, sfDir)
    // Native centroid loop, NOT nlist unrolled l2_distance structs:
    // at the sf1 decade's nlist = 313 the unrolled form re-crossed
    // HotSpot's 8000-byte huge-method limit (the r11 q30 cliff, found
    // again by the r12 sf1 gate's ratio table — ×24.6) and ran
    // interpreted; the loop form emits bit-identical (dist, c_id)
    // scores at constant bytecode size. And only the TOP-2 are
    // needed, so the selection is fused in-loop (CentroidBest best2,
    // r12) — O(nlist) comparisons and ONE 2-struct allocation per row
    // instead of array_sort's O(nlist log nlist) comparisons over a
    // materialized k-struct array (at nlist = 313 the full sort was
    // the residual cost). Tie behavior identical: (dist, c_id)
    // ordering ≡ the sorted form's [0] and [1] ≡ the oracle's
    // row_number order; a 1-cell codebook yields el[1] = NULL exactly
    // like the previous empty-filter array_min.
    n.withColumn("t2",
        graft.functions.CentroidBest.centroid_l2_best2(cents, col("v")))
      .select(col("t2")(0)("c_id").as("cluster"), col("t2")(0)("dist").as("a"),
        col("t2")(1)("dist").as("b"))
      .withColumn("s", when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
        .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        graft.functions.OracleRound.floorRound(
          sum(col("s").cast("decimal(28,12)")).cast("double") / count(lit(1)), 6)
          .as("silhouette"),
        graft.functions.OracleRound.floorRound(
          sum(col("a").cast("decimal(28,12)")).cast("double") / count(lit(1)), 6)
          .as("cohesion"))
      .orderBy("cluster")
  }

  val q143Sql: String = {
    import graft.functions.OracleRound.floorRoundSql
    s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |${kmeansCtesSql("n")},
       |ranked AS (
       |  SELECT n.vec_id, c.c_id, list_distance(c.cv, n.v) AS dist,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY list_distance(c.cv, n.v), c.c_id) AS rk
       |  FROM n, c$KmeansIters c),
       |ab AS (
       |  SELECT r1.c_id AS cluster, r1.dist AS a, r2.dist AS b
       |  FROM ranked r1 JOIN ranked r2
       |    ON r1.vec_id = r2.vec_id AND r2.rk = 2
       |  WHERE r1.rk = 1),
       |sil AS (
       |  SELECT cluster, a,
       |    CASE WHEN greatest(a, b) = 0 THEN 0.0
       |         ELSE (b - a) / greatest(a, b) END AS s
       |  FROM ab)
       |SELECT cluster, count(*) AS n_vecs,
       |  ${floorRoundSql(
          "CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE) / count(*)", 6)} AS silhouette,
       |  ${floorRoundSql(
          "CAST(sum(CAST(a AS DECIMAL(28,12))) AS DOUBLE) / count(*)", 6)} AS cohesion
       |FROM sil GROUP BY cluster ORDER BY cluster""".stripMargin
  }

  /** q150 — per-label embedding diversity by the sum-vector identity:
    * for unit-normalized vectors v̂, the mean pairwise cosine inside a
    * group is exactly (‖Σv̂‖² − n) / (n(n−1)) — so the O(n²) pairwise
    * statistic collapses to ONE corpus pass accumulating per-dimension
    * sums. Reported per label: n_vecs, mean_pair_cos (≈1 ⇒ the label's
    * embeddings have collapsed to a point — an encoder-regression or
    * over-dedup signal; ≈0 ⇒ isotropic spread), and centroid_norm
    * ‖Σv̂‖/n (the resultant length, the directional-statistics view of
    * the same collapse). The curation use: SemDeDup (q133) and
    * diversity-aware sampling need a per-cluster/per-class spread
    * measure, and the naive mean-pairwise-cosine is unrunnable at
    * corpus scale — this is the closed form that replaces it.
    *
    * Scale shape: identical to q130's moment pattern — one
    * posexplode pass into map-side-combined (label, pos) DECIMAL
    * sums (O(labels·dim) state), then O(labels·dim) algebra. The
    * normalization divide happens BEFORE the explode on the
    * codegen'd native dot_product, so the per-element x/‖v‖ doubles
    * are bitwise equal on both engines; per-dim sums go through
    * DECIMAL(28,12) (order-independent), and the over-dims sum of
    * squares re-enters DECIMAL — the q115/q130 zSq discipline.
    * Dimension + zero-norm contracts as in every cosine consumer. */
  def q150(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.DotProduct.dot_product
    val n = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === Dim)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))
      .filter(col("nrm") > 0.0)
    val sums = n
      .select(col("label"), col("nrm"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("nv"),
        sum((col("x") / col("nrm")).cast("decimal(28,12)")).as("s1"))
    sums.groupBy("label")
      .agg(max("nv").as("n_vecs"),
        sum((col("s1").cast("double") * col("s1").cast("double"))
          .cast("decimal(28,12)")).as("ssq"))
      .select(col("label"), col("n_vecs"),
        floorRound(
          when(col("n_vecs") >= 2,
            (col("ssq").cast("double") - col("n_vecs").cast("double")) /
              (col("n_vecs").cast("double") * (col("n_vecs") - 1).cast("double")))
            .otherwise(lit(0.0)), 6).as("mean_pair_cos"),
        floorRound(
          sqrt(col("ssq").cast("double")) / col("n_vecs").cast("double"), 6)
          .as("centroid_norm"))
      .orderBy("label")
  }

  val q150Sql: String =
    s"""WITH n AS (
       |  SELECT label, v, nrm FROM (
       |    SELECT label, CAST(embedding AS DOUBLE[]) AS v,
       |      sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
       |        x -> x * x), 'sum')) AS nrm
       |    FROM embeddings WHERE len(embedding) = $Dim) t0
       |  WHERE nrm > 0),
       |e AS (
       |  SELECT label, i AS pos, v[i] / nrm AS xh
       |  FROM n, (SELECT unnest(generate_series(1, $Dim)) AS i) p),
       |sums AS (
       |  SELECT label, pos, count(*) AS nv,
       |    sum(CAST(xh AS DECIMAL(28,12))) AS s1
       |  FROM e GROUP BY label, pos),
       |g AS (
       |  SELECT label, max(nv) AS n_vecs,
       |    sum(CAST(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
       |      AS DECIMAL(28,12))) AS ssq
       |  FROM sums GROUP BY label)
       |SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
       |  ${floorRoundSql(
            "CASE WHEN n_vecs >= 2 THEN " +
              "(CAST(ssq AS DOUBLE) - CAST(n_vecs AS DOUBLE)) / " +
              "(CAST(n_vecs AS DOUBLE) * CAST(n_vecs - 1 AS DOUBLE)) " +
              "ELSE 0.0 END", 6)} AS mean_pair_cos,
       |  ${floorRoundSql(
            "sqrt(CAST(ssq AS DOUBLE)) / CAST(n_vecs AS DOUBLE)", 6)}
       |    AS centroid_norm
       |FROM g ORDER BY label""".stripMargin

  /** q159 — per-dimension embedding distribution audit: for each of
    * the 64 dimensions, count/min/max/mean/variance plus the
    * dimension's share of total variance — the anisotropy profile an
    * embedding pipeline reads BEFORE committing to a quantizer
    * (q85's per-dim [min,max] grid), an IVF metric (q77's Euclidean
    * cells), or a random-projection LSH family (q37's planes): a few
    * dimensions hoarding the variance mean uniform int8 levels are
    * wasted where the data isn't, and cosine bands hash mostly those
    * dimensions.
    *
    * Scale shape: ONE pass over the corpus — posexplode to
    * (pos, x) and a 64-group map-combined aggregate carrying exact
    * DECIMAL Σx and Σx² (partial-aggregation order can't move
    * them); everything after runs on the 64-row moment relation
    * (variance-share total via an order-free DECIMAL sum of the
    * already-rounded variances, crossed back 1-row). Same moment
    * discipline as q88/q150. */
  def q159(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === Dim)
      .select(posexplode(col("embedding")).as(Seq("pos0", "xf")))
      .select((col("pos0") + 1).as("pos"), col("xf").cast("double").as("x"))
    // pv and the variance total both consume the 64-row moment
    // relation; the pruned subtrees don't canonicalize equal (no
    // exchange reuse — measured two corpus scans unhinted), so cache
    // the 64 rows eagerly: the corpus posexplode runs ONCE
    // (plan-pinned).
    val per = e.groupBy("pos").agg(
      count(lit(1)).as("n_vecs"),
      min("x").as("mn"), max("x").as("mx"),
      sum(col("x").cast("decimal(28,18)")).as("s"),
      sum((col("x") * col("x")).cast("decimal(28,18)")).as("ssq"))
      .scopedCache
    per.count()
    val pv = per
      .withColumn("mean",
        floorRound(col("s").cast("double") / col("n_vecs"), 9))
      .withColumn("variance", floorRound(
        (col("ssq").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n_vecs")) /
          col("n_vecs"), 9))
    val tot = pv.agg(
      sum(col("variance").cast("decimal(28,12)")).cast("double").as("tv"))
    pv.crossJoin(tot) // 1-row total-variance side
      .select(col("pos").cast("long").as("pos"), col("n_vecs"),
        col("mn"), col("mx"), col("mean"), col("variance"),
        floorRound(col("variance") / col("tv"), 6).as("var_share"))
      .orderBy("pos")
  }

  val q159Sql: String =
    s"""WITH e AS (
       |  SELECT i AS pos, CAST(embedding[i] AS DOUBLE) AS x
       |  FROM embeddings, (SELECT unnest(generate_series(1, $Dim)) AS i) p
       |  WHERE len(embedding) = $Dim),
       |per AS (
       |  SELECT pos, count(*) AS n_vecs, min(x) AS mn, max(x) AS mx,
       |    sum(CAST(x AS DECIMAL(28,18))) AS s,
       |    sum(CAST(x * x AS DECIMAL(28,18))) AS ssq
       |  FROM e GROUP BY pos),
       |pv AS (
       |  SELECT pos, n_vecs, mn, mx,
       |    ${floorRoundSql("CAST(s AS DOUBLE) / n_vecs", 9)} AS mean,
       |    ${floorRoundSql(
            "(CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) " +
              "/ n_vecs) / n_vecs", 9)} AS variance
       |  FROM per),
       |tot AS (
       |  SELECT CAST(sum(CAST(variance AS DECIMAL(28,12))) AS DOUBLE) AS tv
       |  FROM pv)
       |SELECT CAST(pos AS BIGINT) AS pos, n_vecs, mn, mx, mean, variance,
       |  ${floorRoundSql("variance / tv", 6)} AS var_share
       |FROM pv, tot ORDER BY pos""".stripMargin

  /** q171 power-iteration rounds. The Rayleigh quotient of ANY unit
    * vector is a certified LOWER bound on λ₁, and iterating only
    * tightens it — so k needs no convergence claim; 8 rounds keep
    * the oracle's unrolled CTE ladder readable. (A converged top
    * EIGENVECTOR is deliberately not part of the contract: the
    * synthetic corpus is near-isotropic — measured λ₂/λ₁ 0.93–0.99
    * across scales — where power iteration needs hundreds of rounds;
    * the spectral-MASS statistics below are exact without any.) */
  private[graft] val PcaIters = 8

  /** q171 — embedding spectral-mass audit (effective rank /
    * collapse detection, the RankMe family — Garrido et al. 2023;
    * participation ratio is the two-moment member): q159 measures
    * variance per AXIS, this measures how variance spreads across
    * DIRECTIONS, which is what retrieval quality actually depends on
    * (Mu & Viswanath 2018's all-but-the-top). From the exact
    * covariance moments: total variance tr(Σ), spectral mass
    * tr(Σ²) = ΣᵢⱼΣᵢⱼ², the participation ratio tr(Σ)²/tr(Σ²) =
    * (Σλ)²/Σλ² ∈ [1, d] (the effective dimension count — 1 means
    * collapsed to a line, d means isotropic), and a CERTIFIED
    * bracket on the top eigenvalue: λ₁ ∈ [max(tr(Σ²)/tr(Σ), R_k),
    * √tr(Σ²)] where R_k is the Rayleigh quotient of a k-step power
    * iterate (every bound is an algebraic identity — Σλ² ≤ λ₁Σλ and
    * λ₁² ≤ Σλ² — so the audit never claims an unconverged
    * eigendecomposition; a spec verifies the bracket against an
    * independent Jacobi eigensolver).
    *
    * Scale shape — numerical linear algebra as aggregation: ONE
    * corpus pass explodes each vector's upper-triangle pair grid
    * (d(d+1)/2 = 2080 entries) into a map-combined exact-DECIMAL
    * second-moment aggregate (q159's discipline at pair granularity;
    * shuffle carries O(d²) decimals per map task, never vectors),
    * plus one narrow per-dim mean pass. EVERYTHING after runs on the
    * O(d²) covariance relation: trace/Frobenius are 2080-row
    * aggregates, each of the [[PcaIters]] matvec rounds is one more,
    * and the driver ferries only the 64 current iterate values
    * between rounds (O(k·d) driver state — the q77 centroid
    * pattern). At 100 TB the pair pass costs n·d²/2 expression
    * evaluations but its SHUFFLE is still d² rows — corpus-size-
    * independent reduction state.
    *
    * Determinism: the pair moments are fixed-point longs (the
    * floorRound discipline as quantization) summed exactly; the
    * means are exact DECIMAL sums; cov derives from them through one
    * shared double formula; every matvec term goes through the
    * engines' double→decimal cast semantics and exact decimal adds
    * (associative — any order gives the same sum); between rounds v
    * rescales by max|m| (an exact decimal max — scaling choice is
    * free for power iteration), so no sqrt enters the recurrence;
    * trace, Frobenius mass, and the Rayleigh quotient are the same
    * exact sums divided through identical double expressions. The
    * oracle runs everything in SQL — the covariance CTEs plus the k
    * matvec rounds unrolled as chained MATERIALIZED CTEs (the q167
    * tower pattern); the Spark side runs the corpus-sized moment
    * pass in Spark and the O(d²) algebra on the driver with verbatim
    * engine arithmetic ([[dec18]]). */
  /** The engines' double→DECIMAL(·,18) cast, replicated for the q171
    * driver algebra: Spark's `Decimal(d)` goes through
    * `BigDecimal.valueOf` (the double's shortest decimal form) and
    * `changePrecision` rounds HALF_UP at the target scale — so
    * driver sums of these are bit-equal to engine sums of
    * `CAST(x AS DECIMAL(38,18))` terms (the exactSum pattern's cast,
    * proven cross-engine across the q159/q88/q150 family). */
  private[graft] def dec18(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(18, java.math.RoundingMode.HALF_UP)

  def q171(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = vecs(spark, sfDir)
    // Upper-triangle second-moment grid: ONE corpus pass through a
    // typed mapPartitions that hand-combines map-side into d(d+1)/2
    // fixed-point longs per partition — floor(x·10¹⁴ + 0.5) is the
    // floorRound discipline as fixed-point quantization: exact long
    // adds locally, exact DECIMAL(38,0) adds across partitions, and
    // the oracle quantizes each element with the IDENTICAL double
    // expression before its own exact sum. (First cut used a plain
    // per-element decimal-cast aggregate: Spark's decimal sum leaves
    // the vectorized path and cost 6 s of a 13 s cell at sf0.1 —
    // measured vs 1.0 s for the same aggregate over doubles; the
    // fixed-point combine does the same class of exact arithmetic in
    // ~0.2 s. Per-partition overflow headroom: |Σ| ≤ rows/partition ×
    // max|xᵢxⱼ| × 10¹⁴, safe through the maxPartitionBytes regime;
    // a wider-valued corpus lowers the quantization scale. The
    // headroom is ENFORCED, not just argued (r10 advice): each
    // quantized term is bounds-checked before the Long conversion
    // and accumulated with Math.addExact, so a corpus wide enough to
    // wrap fails the job loudly instead of silently diverging from
    // the oracle's exact sum at exactly the scales the oracle never
    // runs at.)
    val sp = n.select(col("v")).as[Seq[Double]]
      .mapPartitions { it =>
        val nPairs = Dim * (Dim + 1) / 2
        val cnt = new Array[Long](nPairs)
        val acc = new Array[Long](nPairs)
        it.foreach { vec =>
          val a = vec.toArray
          var idx = 0; var i = 0
          while (i < Dim) {
            var j = i
            while (j < Dim) {
              val q = math.floor(a(i) * a(j) * 1e14 + 0.5)
              if (math.abs(q) >= 9.223372036854775e18)
                throw new ArithmeticException(
                  s"q171 fixed-point term overflows Long: |x_i*x_j|*1e14 = $q")
              acc(idx) = Math.addExact(acc(idx), q.toLong)
              cnt(idx) += 1
              idx += 1; j += 1
            }
            i += 1
          }
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
        var idx = 0; var i = 0
        while (i < Dim) {
          var j = i
          while (j < Dim) {
            if (cnt(idx) > 0) out += ((i + 1, j + 1, cnt(idx), acc(idx)))
            idx += 1; j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("i", "j", "nvp", "sxxp")
      .groupBy("i", "j")
      .agg(sum("nvp").as("nv"),
        sum(col("sxxp").cast("decimal(38,0)")).as("sxx14"))
    val means = n.select(posexplode(col("v")).as(Seq("pos0", "x")))
      .select((col("pos0") + 1).as("d"), col("x"))
      .groupBy("d").agg(sum(col("x").cast("decimal(28,18)")).as("s"))
    // Collect the O(d²) moments and run the algebra on the driver —
    // bounded state exactly like q77's centroid collects (4096 cells
    // regardless of corpus size), and it deletes the ~10 tiny Spark
    // jobs the first cut spent ~0.5 s of stage overhead each on. The
    // driver replicates engine arithmetic verbatim: [[dec18]] IS the
    // engines' double→decimal cast, BigDecimal adds are exact like
    // theirs, doubleValue is their decimal→double cast, and every
    // double expression tree below mirrors the oracle's character for
    // character.
    val spRows = sp.collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getDecimal(3)))).toMap
    // Degenerate corpus (no valid Dim-length vectors): the oracle's
    // ungrouped moment aggregates still emit ONE row — (dims, NULL,
    // NULL, …), measured against the actual CTE tower on an empty
    // table — while a bare .head here would crash the engine (r10
    // advice flagged the crash; its "oracle returns zero rows" guess
    // was wrong). Mirror the oracle's single NULL row.
    if (spRows.isEmpty)
      return Seq((Dim.toLong, Option.empty[Long], Option.empty[Double],
          Option.empty[Double], Option.empty[Double], Option.empty[Double],
          Option.empty[Double], Option.empty[Double], Option.empty[Double]))
        .toDF("dims", "n_vecs", "total_variance", "spectral_mass",
          "participation_ratio", "lambda1_lb", "lambda1_ub",
          "rayleigh_k", "top_share_lb")
    val sD = means.collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue()).toMap
    val nv = spRows.head._2._1
    val nvD = nv.toDouble
    val cov = Array.tabulate(Dim, Dim) { (i0, j0) =>
      val key = if (i0 <= j0) (i0 + 1, j0 + 1) else (j0 + 1, i0 + 1)
      val sxxD = spRows(key)._2.doubleValue()
      (sxxD / 1e14 - sD(i0 + 1) * sD(j0 + 1) / nvD) / nvD
    }
    // Power iteration: v₀ = 1…1; each round an exact-decimal matvec,
    // rescaled by max|m| (an exact decimal max — scaling choice is
    // free for power iteration, and no sqrt enters the recurrence).
    var v = Array.fill(Dim)(1.0)
    for (_ <- 1 to PcaIters) {
      val m = Array.tabulate(Dim) { i =>
        var s = java.math.BigDecimal.ZERO
        var j = 0
        while (j < Dim) { s = s.add(dec18(cov(i)(j) * v(j))); j += 1 }
        s
      }
      val mmax = m.map(_.abs).max
      val mmaxD = mmax.doubleValue()
      v = m.map(_.doubleValue() / mmaxD)
    }
    // Rayleigh numerator vᵀΣv and Frobenius mass over the full grid,
    // vᵀv and the trace over the d cells — every reduction an exact
    // decimal sum of engine-cast terms.
    var vtsvB = java.math.BigDecimal.ZERO
    var frobB = java.math.BigDecimal.ZERO
    var traceB = java.math.BigDecimal.ZERO
    var vtvB = java.math.BigDecimal.ZERO
    for (i <- 0 until Dim; j <- 0 until Dim) {
      vtsvB = vtsvB.add(dec18(cov(i)(j) * v(i) * v(j)))
      frobB = frobB.add(dec18(cov(i)(j) * cov(i)(j)))
    }
    for (i <- 0 until Dim) {
      traceB = traceB.add(dec18(cov(i)(i)))
      vtvB = vtvB.add(dec18(v(i) * v(i)))
    }
    val vtsv = vtsvB.doubleValue(); val frob2 = frobB.doubleValue()
    val trace = traceB.doubleValue(); val vtv = vtvB.doubleValue()
    // floorRound on the driver — OracleRound's own exact-pow10 table
    // (a local math.pow rebuild is exactly the 1-ulp desync its
    // header warns against).
    def r(x: Double, k: Int): Double =
      graft.functions.OracleRound.floorRoundDouble(x, k)
    Seq((Dim.toLong, nv,
      r(trace, 9), r(frob2, 9),
      r(trace * trace / frob2, 6),
      r(math.max(frob2 / trace, vtsv / vtv), 9),
      r(math.sqrt(frob2), 9),
      r(vtsv / vtv, 9),
      r(vtsv / vtv / trace, 6)))
      .toDF("dims", "n_vecs", "total_variance", "spectral_mass",
        "participation_ratio", "lambda1_lb", "lambda1_ub",
        "rayleigh_k", "top_share_lb")
  }

  val q171Sql: String = {
    val matvecs = (1 to PcaIters).map { r =>
      s"""m$r AS MATERIALIZED (
         |  SELECT c.i AS i, sum(CAST(c.cov * v${r - 1}.v AS DECIMAL(38,18))) AS m
         |  FROM c JOIN v${r - 1} ON c.j = v${r - 1}.j GROUP BY c.i),
         |s$r AS MATERIALIZED (SELECT max(abs(m)) AS mm FROM m$r),
         |v$r AS MATERIALIZED (
         |  SELECT i AS j, CAST(m AS DOUBLE) / CAST((SELECT mm FROM s$r) AS DOUBLE) AS v
         |  FROM m$r)""".stripMargin
    }.mkString(",\n")
    val vk = s"v$PcaIters"
    s"""WITH n AS MATERIALIZED (
       |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE len(embedding) = $Dim),
       |pairs AS (
       |  SELECT p.i AS i, p.j AS j, p.xx AS xx FROM (
       |    SELECT unnest(flatten(list_transform(range(1, $Dim + 1), i ->
       |      list_transform(range(i, $Dim + 1), j ->
       |        struct_pack(i := i, j := j, xx := v[i] * v[j]))))) AS p
       |    FROM n) t),
       |sp AS (
       |  SELECT i, j, count(*) AS nv,
       |    sum(CAST(floor(xx * 100000000000000.0 + 0.5) AS BIGINT)) AS sxx14
       |  FROM pairs GROUP BY i, j),
       |means AS (
       |  SELECT d, sum(CAST(x AS DECIMAL(28,18))) AS s FROM (
       |    SELECT d, v[d] AS x
       |    FROM n, (SELECT unnest(generate_series(1, $Dim)) AS d) dd) e
       |  GROUP BY d),
       |upper_cov AS (
       |  SELECT sp.i, sp.j, nv,
       |    (CAST(sxx14 AS DOUBLE) / 100000000000000.0
       |      - CAST(mi.s AS DOUBLE) * CAST(mj.s AS DOUBLE) / nv) / nv AS cov
       |  FROM sp
       |  JOIN means mi ON sp.i = mi.d
       |  JOIN means mj ON sp.j = mj.d),
       |c AS MATERIALIZED (
       |  SELECT i, j, nv, cov FROM upper_cov
       |  UNION ALL
       |  SELECT j AS i, i AS j, nv, cov FROM upper_cov WHERE i <> j),
       |v0 AS (
       |  SELECT unnest(generate_series(1, $Dim)) AS j, 1.0::DOUBLE AS v),
       |$matvecs,
       |ray AS (
       |  SELECT CAST(sum(CAST(c.cov * va.v * vb.v AS DECIMAL(38,18))) AS DOUBLE)
       |    AS vtsv
       |  FROM c JOIN $vk va ON c.i = va.j JOIN $vk vb ON c.j = vb.j),
       |fr AS (
       |  SELECT CAST(sum(CAST(cov * cov AS DECIMAL(38,18))) AS DOUBLE) AS frob2
       |  FROM c),
       |vv AS (
       |  SELECT CAST(sum(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE) AS vtv
       |  FROM $vk),
       |tr AS (
       |  SELECT CAST(max(nv) AS BIGINT) AS n_vecs,
       |    CAST(sum(CAST(cov AS DECIMAL(28,18))) AS DOUBLE) AS trace
       |  FROM c WHERE i = j)
       |SELECT CAST($Dim AS BIGINT) AS dims, n_vecs,
       |  ${floorRoundSql("trace", 9)} AS total_variance,
       |  ${floorRoundSql("frob2", 9)} AS spectral_mass,
       |  ${floorRoundSql("trace * trace / frob2", 6)} AS participation_ratio,
       |  ${floorRoundSql("greatest(frob2 / trace, vtsv / vtv)", 9)} AS lambda1_lb,
       |  ${floorRoundSql("sqrt(frob2)", 9)} AS lambda1_ub,
       |  ${floorRoundSql("vtsv / vtv", 9)} AS rayleigh_k,
       |  ${floorRoundSql("(vtsv / vtv) / trace", 6)} AS top_share_lb
       |FROM ray, fr, vv, tr""".stripMargin
  }

  /** The corpus sliced into its [[PqM]] subvector views: one Generate
    * over the (cached) vector relation emits (subspace, vec_id, v)
    * with v the [[PqSubDim]]-dim slice — so every PQ training and
    * assignment pass touches the corpus ONCE regardless of M. */
  private def pqSliced(n: DataFrame): DataFrame = {
    val entries = (0 until PqM).map { m =>
      struct(lit(m.toLong).as("subspace"),
        slice(col("v"), m * PqSubDim + 1, PqSubDim).as("sv"))
    }
    n.select(col("vec_id"), explode(array(entries: _*)).as("e"))
      .select(col("e.subspace").as("subspace"), col("vec_id"),
        col("e.sv").as("v"))
  }

  /** Narrow argmin of column `v` over one subspace codebook —
    * [[assignL2]]'s struct trick on a caller-chosen vector column
    * (the sliced rows in [[pqAssign]], an inline slice in q160's
    * single-pass encoder). */
  private def pqBestOn(v: org.apache.spark.sql.Column,
      cent: Seq[(Long, Seq[Double])]): org.apache.spark.sql.Column =
    // Loop-form [[graft.functions.CentroidScores]], NOT k unrolled
    // l2_distance(typedlit(...)) structs (the r12 assignL2/q143 lesson
    // applied to PQ): the unrolled form built a ~30x larger expression
    // tree that Catalyst re-optimized and Janino re-generated on EVERY
    // training iteration — pqTrain's cost was driver-side planning, not
    // flops (measured core-count-invariant: 2.38 s at local[32] vs
    // 2.43 s at local[8] solo). The loop expression carries the
    // codebook in the references array, scores bit-identical by the
    // shared sequential-accumulation contract (same as assignL2), and
    // (r12 follow-up) the argmin is fused in-loop (CentroidBest) so no
    // per-row k-struct array is ever allocated.
    graft.functions.CentroidBest.centroid_l2_best(cent, v)

  private def pqBest(cent: Seq[(Long, Seq[Double])]): org.apache.spark.sql.Column =
    pqBestOn(col("v"), cent)

  /** PQ codebooks memoized per corpus, the [[trainedCentroids]]
    * pattern: q158 (the training benchmark) always retrains and
    * refreshes the memo; the ADC serving path (q160) reads it —
    * trained once, served by the family, like a real index build.
    * Fingerprint-keyed like [[centroidMemo]] (stale-corpus safety). */
  private val codebookMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Int, Seq[(Long, Seq[Double])]]]()

  /** Touch every similarity-family trained-model memo (driver-value
    * indexes: coarse centroids, base-slice centroids, PQ codebooks)
    * so the bench's timed cells measure index SERVING — the
    * [[graft.operators.Dedup.prebuildIndexes]] twin; the training
    * benchmarks themselves (q77/q158) always retrain regardless. */
  private[graft] def prebuildIndexes(spark: SparkSession, sfDir: String): Seq[String] = {
    trainedCentroids(spark, sfDir)
    maintCentroids(spark, sfDir)
    trainedCodebooks(spark, sfDir)
    ivfAssignIndex(spark, sfDir)
    Seq("kmeans-centroids", "maint-centroids", "pq-codebooks", "ivf-assign")
  }

  private def trainedCodebooks(spark: SparkSession, sfDir: String): Map[Int, Seq[(Long, Seq[Double])]] = {
    val key = graft.sources.Tables.fingerprint(sfDir, Seq("embeddings"))
    codebookMemo.computeIfAbsent(key, _ => {
      // No persist — see [[trainedCentroids]] (r12).
      val n = vecs(spark, sfDir)
      pqTrain(pqSliced(n), n.count())
    })
  }

  /** Assign every (subspace, vector-slice) row to its nearest
    * codeword: a CASE over the subspace id selects that subspace's
    * codebook literals, so the assignment for ALL M codebooks is one
    * narrow codegen'd pass — no join, no shuffle, and only the
    * matching branch's k distances evaluate per row. */
  private def pqAssign(sl: DataFrame,
      cents: Map[Int, Seq[(Long, Seq[Double])]]): DataFrame = {
    val ms = cents.toSeq.sortBy(_._1)
    val bestExpr = ms.tail.foldLeft(
      when(col("subspace") === ms.head._1, pqBest(ms.head._2))) {
      case (acc, (m, cent)) => acc.when(col("subspace") === m, pqBest(cent))
    }
    sl.withColumn("best", bestExpr)
      .select(col("subspace"), col("vec_id"), col("v"),
        col("best.c_id").as("code"), col("best.dist").as("dist"))
  }

  /** Lloyd training for all [[PqM]] subspace codebooks SIMULTANEOUSLY:
    * the per-iteration means aggregate groups by (subspace, code,
    * pos), so one corpus-cache scan per iteration trains every
    * codebook — M never multiplies the scan count (the real PQ
    * trainer shape; [[lloydTrain]] is the single-space original).
    * Per subspace the arithmetic is IDENTICAL to an independent
    * [[lloydTrain]] run on that slice (grouping by subspace only
    * partitions the rows), which is what the per-subspace unrolled
    * oracle chains verify. O(M·k·d) doubles reach the driver.
    *
    * Bounded training sample (r12, the [[TrainCap]] discipline
    * extended from [[lloydTrain]]): the mean-update loop iterates
    * over the expected-[[TrainCap]]-vector deterministic hash sample
    * of the corpus — identical rule, so for N ≤ TrainCap (every
    * driver fixture) the filter keeps everything and the codebooks
    * are bit-identical to the r11 full-corpus training. `cnt` is the
    * CORPUS vector count (not the sliced row count): the rule
    * samples vec_ids, and each sampled vector contributes all M
    * slices, exactly like the per-subspace oracle twins. At 100 TB
    * the training loop is O(TrainCap·M·k·subdim) flops regardless of
    * N — the final full-corpus pass (q158's distortion table, the
    * encode in q160) is serving, and stays full. */
  private def pqTrain(sl: DataFrame, cnt: Long): Map[Int, Seq[(Long, Seq[Double])]] = {
    var cents: Map[Int, Seq[(Long, Seq[Double])]] =
      sl.filter(col("vec_id") < KmeansK).collect()
        .groupBy(_.getLong(0).toInt)
        .map { case (m, rows) =>
          m -> rows.map(r => (r.getLong(1), r.getSeq[Double](2).toSeq))
            .sortBy(_._1).toSeq
        }
    // ONE collect of the bounded sample's sliced rows (≤ TrainCap·M
    // subdim-vectors, ≤ 4 MB forever), then the whole loop runs in the
    // driver — [[lloydTrain]]'s r12 posture; per subspace each step is
    // exactly [[lloydStepLocal]] on that slice, which is the identical
    // arithmetic the (subspace, code, pos) distributed DECIMAL job
    // computed (grouping by subspace only partitioned the rows).
    val rows: Map[Int, Array[Array[Double]]] = sl.filter(
        expr(graft.functions.HashBucket.bucketExpr("vec_id", TrainBucketMod)) *
          lit(cnt) < lit(TrainCap * TrainBucketMod))
      .collect()
      .groupBy(_.getLong(0).toInt)
      .map { case (m, rs) => m -> rs.map(_.getSeq[Double](2).toArray) }
    for (_ <- 1 to KmeansIters) {
      cents = cents.map { case (m, cent) =>
        m -> lloydStepLocal(rows.getOrElse(m, Array.empty), cent)
      }
    }
    cents
  }

  /** q158 — product-quantization codebook training + distortion
    * audit (Jégou/Douze/Schmid, "Product Quantization for Nearest
    * Neighbor Search", IEEE TPAMI 2011): the 64-dim embedding splits
    * into [[PqM]]=4 subspaces of [[PqSubDim]]=16 dims; each subspace
    * trains its own k=[[KmeansK]] codebook with the exact q77 Lloyd
    * recipe; every vector is then encoded as M code ids. Reported
    * per (subspace, code): member count, total and mean assignment
    * distance — the codebook-balance / distortion table a PQ index
    * build inspects before committing to the compression (a hot or
    * empty codeword means the subspace's codebook wastes its
    * 8-way budget). Completes the ANN-compression family: q85
    * scalar int8, q77/q30 coarse IVF, q37 binary LSH, q158 PQ.
    *
    * Scale shape: corpus cached ONCE; [[pqSliced]]'s Generate gives
    * every pass all M subvector views in a single scan; training is
    * [[KmeansIters]] scans TOTAL (not per subspace — see
    * [[pqTrain]]); assignment is the narrow CASE-over-codebooks
    * argmin (no join); the only corpus-sized shuffle is the final
    * map-combined (subspace, code) aggregate onto M·k = 32 groups.
    * At 100 TB this is scans + one bounded aggregate, exactly like
    * q77 — M multiplies only driver-side centroid literals.
    *
    * Determinism: same discipline as q77 bitwise — seeds are
    * vec_id < k, means are DECIMAL(28,12) sums, distances are the
    * codegen'd l2_distance ≙ DuckDB list_distance (proven bit-equal
    * by the q77/q58 hash matches), ties break on code id; the
    * oracle unrolls [[kmeansCtesSql]] once per subspace over the
    * sliced relations. */
  def q158(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.OracleRound.exactSum
    // No corpus persist (r12): with the in-driver trainer every
    // consumer (count, seed/sample collects, the final distortion
    // pass) reads the corpus exactly once — see [[q77]].
    val n = vecs(spark, sfDir)
    val cnt = n.count()
    val sl = pqSliced(n)
    val cents = pqTrain(sl, cnt)
    // refresh the served index with the identical deterministic value
    // (the q77 → trainedCentroids discipline)
    codebookMemo.put(graft.sources.Tables.fingerprint(sfDir, Seq("embeddings")), cents)
    pqAssign(sl, cents)
      .groupBy("subspace", "code")
      .agg(count(lit(1)).as("n_vecs"),
        floorRound(exactSum(col("dist")), 4).as("cost"),
        floorRound(exactSum(col("dist")) / count(lit(1)), 6).as("mean_dist"))
      .orderBy("subspace", "code")
  }

  /** Per-subspace unrolled Lloyd chains (the q77Sql generator with
    * dim = [[PqSubDim]] and distinct CTE prefixes) + one final
    * assignment each, unioned into the 32-cell distortion table. */
  val q158Sql: String = {
    import graft.functions.OracleRound.exactSumSql
    val subs = (0 until PqM).map { m =>
      s"""s$m AS (SELECT vec_id, v[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS v FROM n),
         |${kmeansCtesSql(s"s$m", PqSubDim, s"s$m", scaleK = false)},
         |f$m AS (SELECT $m AS subspace, cluster AS code, dist FROM (
         |  SELECT s$m.vec_id, c.c_id AS cluster, list_distance(c.cv, s$m.v) AS dist,
         |    row_number() OVER (PARTITION BY s$m.vec_id
         |      ORDER BY list_distance(c.cv, s$m.v), c.c_id) AS rk
         |  FROM s$m, s${m}c$KmeansIters c) t WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val union = (0 until PqM).map(m => s"SELECT * FROM f$m").mkString(" UNION ALL ")
    s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |$subs,
       |u AS ($union)
       |SELECT CAST(subspace AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
       |  count(*) AS n_vecs,
       |  ${floorRoundSql(exactSumSql("dist"), 4)} AS cost,
       |  ${floorRoundSql(s"${exactSumSql("dist")} / count(*)", 6)} AS mean_dist
       |FROM u GROUP BY subspace, code ORDER BY subspace, code""".stripMargin
  }

  /** q160 — PQ asymmetric-distance (ADC) approximate k-NN: the
    * SERVING path of q158's compression (Jégou et al. TPAMI 2011
    * §III). The corpus is represented only by its M=[[PqM]] code ids
    * (32:1 compression of the 64-dim doubles); each of the 20 probes
    * (q58's exact-L2 probe set, so recall is measurable against the
    * uncompressed truth) precomputes a (code → squared-distance)
    * lookup table per subspace against [[trainedCodebooks]]; a
    * candidate's approximate distance is then M table lookups and
    * M−1 additions — no vector arithmetic per pair at all, which is
    * the entire point of PQ at scale. Top-3 by (adc², neighbor id).
    *
    * Scale shape: codebooks come from the per-corpus memo (q158 is
    * the training benchmark; serving never retrains); encoding is a
    * single NARROW projection computing all M argmins per row (no
    * join, no shuffle, one corpus scan), materialized ONCE as the
    * scoped-cached encoded table — the layout an ANN service
    * actually stores, and the boundary that keeps the encode
    * expression from re-running per candidate pair in the join
    * stage; the O(Q·M·k) LUT rows BROADCAST onto it; the per-probe
    * head is a WindowGroupLimit-bounded top-k over map lookups — the
    * corpus never shuffles.
    *
    * Determinism: LUT entries accumulate (q_i−c_i)² left-to-right on
    * the driver — the same order as the oracle's list_transform sum;
    * adc² adds the M parts in fixed textual order; codebooks are
    * bit-equal across engines (q158's hash-match proves the trainer);
    * ties break on neighbor id. */
  def q160(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = trainedCodebooks(spark, sfDir)
    val n = vecs(spark, sfDir)
    // All M codes in ONE narrow two-step projection (slice each
    // subspace once, then its argmin), MATERIALIZED before the
    // serving join: the encoded table is the artifact a PQ service
    // stores (vec_id + M small ints — 32:1 vs the raw vectors), and
    // materializing it keeps the 32-distance encode expression out
    // of the join/window stage, where the measured plan re-evaluated
    // it per candidate PAIR (a ×|probes| blow-up: 22 s → 3 s at ×10).
    val sliced = n.select(
      col("vec_id") +: (0 until PqM).map(m =>
        slice(col("v"), m * PqSubDim + 1, PqSubDim).as(s"s$m")): _*)
    val enc = sliced.select(
      col("vec_id") +: (0 until PqM).map { m =>
        pqBestOn(col(s"s$m"), cents(m)).getField("c_id").as(s"c$m")
      }: _*).scopedCache
    enc.count() // eager: encode once, serve many
    // per-probe LUTs: code -> squared distance, driver-computed with
    // the oracle's exact accumulation order; the frame is built from
    // an explicit PqM-wide schema (a fixed-arity tuple here would
    // compile under a PqM change and then fail at runtime)
    val probeRows = n.filter(col("vec_id") < 20).collect().map { r =>
      val qv = r.getSeq[Double](1).toArray
      val luts = (0 until PqM).map { m =>
        cents(m).map { case (cId, cv) =>
          var acc = 0.0
          var i = 0
          while (i < PqSubDim) {
            val d = qv(m * PqSubDim + i) - cv(i); acc += d * d; i += 1
          }
          cId -> acc
        }.toMap
      }
      org.apache.spark.sql.Row.fromSeq(r.getLong(0) +: luts)
    }
    val probeSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("q_id",
        org.apache.spark.sql.types.LongType) +:
        (0 until PqM).map(m => org.apache.spark.sql.types.StructField(s"lut$m",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.LongType,
            org.apache.spark.sql.types.DoubleType))))
    val q = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probeSchema)
    val adcSq = (0 until PqM).map(m => col(s"lut$m")(col(s"c$m")))
      .reduceLeft(_ + _)
    val w = Window.partitionBy("q_id").orderBy(col("adc_sq"), col("vec_id"))
    enc.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("adc_sq", adcSq)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        floorRound(sqrt(col("adc_sq")), 6).as("adc_dist"))
      .orderBy("q_id", "rank")
  }

  /** Per-subspace unrolled Lloyd chains + code assignment (the
    * q158Sql geometry), then ADC as M per-pair list_transform sums
    * added in the same textual order as the Spark column. */
  val q160Sql: String = {
    val subs = (0 until PqM).map { m =>
      s"""s$m AS (SELECT vec_id, v[${m * PqSubDim + 1}:${(m + 1) * PqSubDim}] AS v FROM n),
         |${kmeansCtesSql(s"s$m", PqSubDim, s"s$m", scaleK = false)},
         |f$m AS (SELECT vec_id, cluster AS c$m FROM (
         |  SELECT s$m.vec_id, c.c_id AS cluster,
         |    row_number() OVER (PARTITION BY s$m.vec_id
         |      ORDER BY list_distance(c.cv, s$m.v), c.c_id) AS rk
         |  FROM s$m, s${m}c$KmeansIters c) t WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val parts = (0 until PqM).map { m =>
      s"list_aggregate(list_transform(generate_series(1, $PqSubDim), " +
        s"i -> (q.qv[${m * PqSubDim} + i] - k$m.cv[i]) * " +
        s"(q.qv[${m * PqSubDim} + i] - k$m.cv[i])), 'sum')"
    }
    s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |$subs,
       |enc AS (
       |  SELECT f0.vec_id, f0.c0, f1.c1, f2.c2, f3.c3
       |  FROM f0 JOIN f1 USING (vec_id) JOIN f2 USING (vec_id)
       |    JOIN f3 USING (vec_id)),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM n WHERE vec_id < 20),
       |pairs AS (
       |  SELECT q.q_id, e.vec_id,
       |    ${parts(0)} + ${parts(1)} + ${parts(2)} + ${parts(3)} AS adc_sq
       |  FROM q, enc e
       |  JOIN s0c$KmeansIters k0 ON k0.c_id = e.c0
       |  JOIN s1c$KmeansIters k1 ON k1.c_id = e.c1
       |  JOIN s2c$KmeansIters k2 ON k2.c_id = e.c2
       |  JOIN s3c$KmeansIters k3 ON k3.c_id = e.c3
       |  WHERE e.vec_id <> q.q_id)
       |SELECT q_id, rank, neighbor_id,
       |  ${floorRoundSql("sqrt(adc_sq)", 6)} AS adc_dist
       |FROM (
       |  SELECT q_id, vec_id AS neighbor_id, adc_sq,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc_sq, vec_id) AS rank
       |  FROM pairs) t
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  }

  /** q162 geometry: shortlist width, selection size, and the
    * relevance/diversity trade-off λ (Carbonell/Goldstein SIGIR 1998
    * use 0.7 for their summarization runs). Written as SQL-text
    * fragments so both engines evaluate the identical expression. */
  private val MmrShortlist = 30
  private val MmrK = 5
  // λ and (1−λ) as SQL-text constants — the ONE edit point; both the
  // driver greedy and the oracle derive from these strings (parsing
  // "0.3" beats computing 1 − 0.7 = 0.30000000000000004)
  private val MmrL = "0.7"
  private val MmrD = "0.3"
  private val MmrScoreSql: String => String =
    maxSim => s"$MmrL * rel - $MmrD * $maxSim"
  private val MmrLW = MmrL.toDouble
  private val MmrDW = MmrD.toDouble

  /** q162 — maximal-marginal-relevance (MMR) diversified selection:
    * the diversity-aware retrieval head (Carbonell/Goldstein 1998)
    * a curation pipeline runs when the plain top-k is redundant —
    * few-shot example selection, dedup-aware context packing, eval
    * set construction. From the cosine top-[[MmrShortlist]] shortlist
    * against the q161 probe (lowest-id nonzero-norm vector), greedily
    * pick [[MmrK]] documents maximizing 0.7·rel − 0.3·max-sim-to-
    * already-picked (ties → doc id), reporting rank, relevance, and
    * the marginal score at pick time.
    *
    * Scale shape: the corpus-sized work is exactly one narrow cosine
    * projection with a TakeOrdered head (the q29/q161 leg); the
    * greedy head is INHERENTLY sequential (step i depends on picks
    * 1..i−1), so it runs on the driver over the collected 30-row
    * shortlist — O(shortlist·k) flops on O(shortlist·d) bounded
    * bytes, the same driver-state class as k-means' O(k·d) centroids
    * (distributing 30 rows through k dependent stages would pay k
    * job launches to avoid kilobytes of driver state). At 100 TB the
    * shortlist would come from an index (q30/q160) — the head is
    * unchanged.
    *
    * Determinism: rel comes from the codegen'd [[cosine_sim]] (q29's
    * proven DuckDB equivalence); pairwise sims replay the SAME fused
    * dot/norms loop on the driver; the score is the shared
    * [[MmrScoreSql]] text on both engines; max over picked sims is
    * exact; floor-rounds only at presentation. */
  def q162(spark: SparkSession, sfDir: String): DataFrame = {
    val n = cvecs(spark, sfDir)
    val qv = n.orderBy("vec_id").limit(1).collect()(0).getSeq[Double](1).toSeq
    val cand = n
      .withColumn("rel", cosine_sim(typedlit(qv), col("v")))
      .orderBy(col("rel").desc, col("vec_id")).limit(MmrShortlist)
      .select("vec_id", "rel", "v").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Array[Double])]
    var remaining = cand.toSeq
    for (_ <- 1 to math.min(MmrK, cand.length)) {
      val scored = remaining.map { case (id, rel, v) =>
        val maxSim =
          if (picked.isEmpty) 0.0
          else picked.map(p => cos(v, p._4)).max
        (MmrLW * rel - MmrDW * maxSim, id, rel, v)
      }
      val best = scored.minBy { case (sc, id, _, _) => (-sc, id) }
      picked += ((best._2, best._3, best._1, best._4))
      remaining = remaining.filterNot(_._1 == best._2)
    }
    def fr6(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val rows = picked.toSeq.zipWithIndex.map { case ((id, rel, sc, _), i) =>
      ((i + 1).toLong, id, fr6(rel), fr6(sc))
    }
    import spark.implicits._
    rows.toDF("rank", "doc_id", "rel", "mmr_score").orderBy("rank")
  }

  /** Unrolled greedy chain: pick_i selects the argmax of the shared
    * [[MmrScoreSql]] over candidates outside sel_{i-1}, with max-sim
    * computed from the 30×29 pairwise-cosine relation — bounded CTEs
    * throughout, the [[kmeansCtesSql]] oracle discipline. */
  val q162Sql: String = {
    val steps = (2 to MmrK).map { i =>
      s"""pick$i AS (
         |  SELECT c.doc_id, c.rel, ${MmrScoreSql("ms.m")} AS score
         |  FROM cand c JOIN (
         |    SELECT ia, max(sim) AS m FROM p
         |    WHERE ib IN (SELECT doc_id FROM sel${i - 1}) GROUP BY ia) ms
         |    ON ms.ia = c.doc_id
         |  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel${i - 1})
         |  ORDER BY score DESC, c.doc_id LIMIT 1),
         |sel$i AS (SELECT doc_id FROM sel${i - 1}
         |  UNION ALL SELECT doc_id FROM pick$i)""".stripMargin
    }.mkString(",\n")
    val out = (1 to MmrK).map(i =>
      s"SELECT $i AS rank, doc_id, rel, score FROM pick$i").mkString(" UNION ALL ")
    s"""WITH $normedSql,
       |probe AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n
       |  ORDER BY vec_id LIMIT 1),
       |cand AS (
       |  SELECT vec_id AS doc_id,
       |    list_inner_product(qv, v) / (qn * nrm) AS rel, v, nrm
       |  FROM n, probe ORDER BY rel DESC, vec_id LIMIT $MmrShortlist),
       |p AS (
       |  SELECT a.doc_id AS ia, b.doc_id AS ib,
       |    list_inner_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
       |  FROM cand a, cand b WHERE a.doc_id <> b.doc_id),
       |pick1 AS (
       |  SELECT doc_id, rel, ${MmrScoreSql("0.0")} AS score
       |  FROM cand ORDER BY score DESC, doc_id LIMIT 1),
       |sel1 AS (SELECT doc_id FROM pick1),
       |$steps
       |SELECT CAST(rank AS BIGINT) AS rank, doc_id,
       |  ${floorRoundSql("rel", 6)} AS rel,
       |  ${floorRoundSql("score", 6)} AS mmr_score
       |FROM ($out) u ORDER BY rank""".stripMargin
  }

  /** q163 language pair: mine English-source / German-target
    * candidates (the fixture's largest and a mid-size lang). */
  private val BitextSrcLang = "en"
  private val BitextTgtLang = "de"

  /** q163 — margin-based bitext mining: the parallel-corpus miner
    * (Artetxe/Schwenk margin criterion, the difference variant) that
    * harvests translation-pair candidates for multilingual training.
    * Every document's embedding is assigned to its q77-trained IVF
    * cell (the q30/q132 serving assignment, verbatim); within each
    * cell, every source-language doc scores its target-language
    * candidates by cosine, and the MARGIN — best minus second-best —
    * separates genuine translation pairs (one clear match) from
    * dense-region noise (many near-equal neighbors, the hubness
    * failure absolute-threshold mining suffers). Reports the top-10
    * pairs by margin with the candidate count that backed each.
    *
    * Scale shape: assignment is the narrow centroid-literal argmax
    * (no shuffle); the cross-language pair build joins ONLY within a
    * cell, with the join strategy left UNHINTED — AQE broadcasts the
    * target slice while it fits and falls back to a shuffle join
    * when it doesn't (a forced broadcast of a corpus-proportional
    * side is the q154 driver-OOM hazard); a probe touches
    * |tgt-lang|/nlist of the corpus, never all-pairs (at 100 TB the
    * target side is a per-cell ANN index, this query prices its
    * layout); ranking is per-source-doc over cell-bounded candidates;
    * the final head is a TakeOrdered top-10. Requiring a second-best
    * candidate (margin needs one) drops singleton-cell sources — the
    * criterion is undefined there, exactly as in the paper.
    *
    * Determinism: cell assignment and cosine are the q30/q132-proven
    * expressions; the margin is one subtraction of bit-equal doubles;
    * ties break on doc ids; floor-rounds at presentation only. */
  def q163(spark: SparkSession, sfDir: String): DataFrame = {
    val langs = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val assigned = ivfAssignIndex(spark, sfDir)
      .join(langs, col("vec_id") === col("doc_id"))
    val src = assigned.filter(col("lang") === BitextSrcLang)
      .select(col("vec_id").as("src_doc"), col("v").as("sv"), col("cluster"))
    val tgt = assigned.filter(col("lang") === BitextTgtLang)
      .select(col("vec_id").as("tgt_doc"), col("v").as("tv"), col("cluster"))
    val wRank = Window.partitionBy("src_doc").orderBy(col("cos").desc, col("tgt_doc"))
    val wCnt = Window.partitionBy("src_doc")
    // No broadcast hint: the target-language slice is
    // corpus-proportional (the q154 lesson — hint-forcing a
    // data-dependent-size side is the driver-OOM path at 100 TB).
    // AQE picks broadcast while the slice fits and degrades to a
    // shuffle join when it doesn't; the real 100 TB layout is a
    // per-cell target-language index, which this query prices.
    val ranked = src.join(tgt, Seq("cluster"))
      .withColumn("cos", cosine_sim(col("sv"), col("tv")))
      .withColumn("n_cands", count(lit(1)).over(wCnt))
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= 2)
    ranked.groupBy("src_doc")
      .agg(max(when(col("rk") === 1,
          struct(col("cos"), col("tgt_doc")))).as("first"),
        max(when(col("rk") === 2, col("cos"))).as("cos2"),
        max("n_cands").as("n_cands"))
      .filter(col("cos2").isNotNull) // margin undefined for singletons
      .select(col("src_doc"), col("first.tgt_doc").as("tgt_doc"),
        col("n_cands"),
        col("first.cos").as("cos1"), (col("first.cos") - col("cos2")).as("mg"))
      .orderBy(col("mg").desc, col("src_doc")).limit(10)
      .select(col("src_doc"), col("tgt_doc"), col("n_cands"),
        floorRound(col("cos1"), 6).as("cos_best"),
        floorRound(col("mg"), 6).as("margin"))
  }

  /** The q132Sql cell-assignment chain, then the within-cell
    * cross-language rank/margin in plain SQL. */
  val q163Sql: String =
    s"""WITH nv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE len(embedding) = $Dim),
       |${kmeansCtesSql("nv")},
       |n AS (
       |  SELECT vec_id, v, nrm FROM (
       |    SELECT vec_id, v,
       |      sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
       |    FROM nv) t0
       |  WHERE nrm > 0),
       |cent AS (SELECT c_id, cv AS qv,
       |    sqrt(list_aggregate(list_transform(cv, x -> x * x), 'sum')) AS qn
       |  FROM c$KmeansIters),
       |rankedc AS (
       |  SELECT n.vec_id, n.v, n.nrm, cent.c_id,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY list_inner_product(cent.qv, n.v) / (cent.qn * n.nrm) DESC,
       |               cent.c_id) AS rk
       |  FROM n, cent),
       |al AS (
       |  SELECT r.vec_id, r.v, r.nrm, r.c_id AS cluster, d.lang
       |  FROM rankedc r JOIN documents d ON d.doc_id = r.vec_id
       |  WHERE r.rk = 1),
       |src AS (SELECT vec_id AS src_doc, v AS sv, nrm AS sn, cluster
       |  FROM al WHERE lang = '$BitextSrcLang'),
       |tgt AS (SELECT vec_id AS tgt_doc, v AS tv, nrm AS tn, cluster
       |  FROM al WHERE lang = '$BitextTgtLang'),
       |pairs AS (
       |  SELECT s.src_doc, t.tgt_doc,
       |    list_inner_product(s.sv, t.tv) / (s.sn * t.tn) AS cos
       |  FROM src s JOIN tgt t ON s.cluster = t.cluster),
       |rk AS (
       |  SELECT src_doc, tgt_doc, cos,
       |    row_number() OVER (PARTITION BY src_doc
       |      ORDER BY cos DESC, tgt_doc) AS rk,
       |    count(*) OVER (PARTITION BY src_doc) AS n_cands
       |  FROM pairs),
       |top AS (
       |  SELECT r1.src_doc, r1.tgt_doc, r1.n_cands, r1.cos AS cos1,
       |    r2.cos AS cos2
       |  FROM rk r1 JOIN rk r2
       |    ON r1.src_doc = r2.src_doc AND r1.rk = 1 AND r2.rk = 2)
       |SELECT src_doc, tgt_doc, CAST(n_cands AS BIGINT) AS n_cands,
       |  ${floorRoundSql("cos1", 6)} AS cos_best,
       |  ${floorRoundSql("cos1 - cos2", 6)} AS margin
       |FROM top ORDER BY cos1 - cos2 DESC, src_doc LIMIT 10""".stripMargin

  /** q176 — cluster-balanced diversity sample: deterministic
    * per-Voronoi-cell quotas of ⌈√|cell|⌉ members, selected by
    * md5(vec_id) rank within the cell — the "sample across semantic
    * space, not across row order" selection a curation pipeline uses
    * to keep long-tail clusters represented (uniform sampling is
    * dominated by the head clusters; √-scaling is the standard
    * between-uniform-and-equal allocation). Rides the `ivf-assign`
    * family index (r11 verdict item 2), so the assignment pass is
    * served from the posting relation, not recomputed; the only new
    * work is one cell-keyed window (count + hash rank in a single
    * partition pass — both windows share the exchange).
    *
    * 100 TB shape: E|cell| ≈ 64 by the nlist schedule, so every
    * window group is ~64 rows regardless of corpus size, and the
    * output is Σ⌈√|cell|⌉ ≈ N/8 rows of ids — the downstream
    * training-mix join key, never vectors. Determinism is the md5
    * rank (HashBucket discipline): retries and engines agree on the
    * exact member set. */
  def q176(spark: SparkSession, sfDir: String): DataFrame = {
    val byCell = Window.partitionBy("cluster")
    ivfAssignIndex(spark, sfDir)
      .select(col("vec_id"), col("cluster"))
      .withColumn("csize", count(lit(1)).over(byCell))
      .withColumn("rk", row_number().over(byCell.orderBy(
        expr(graft.functions.HashBucket.rawExpr("vec_id")), col("vec_id")))
        .cast("long"))
      .withColumn("quota", ceil(sqrt(col("csize").cast("double"))).cast("long"))
      .filter(col("rk") <= col("quota"))
      .select(col("cluster").cast("long").as("cluster"),
        col("csize").cast("long").as("csize"), col("quota"), col("rk"),
        col("vec_id"))
      .orderBy("cluster", "rk")
  }

  val q176Sql: String =
    s"""WITH $ivfAssignedSql,
       |sized AS (
       |  SELECT cluster, vec_id,
       |    count(*) OVER (PARTITION BY cluster) AS csize,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY ${graft.functions.HashBucket.rawSql("vec_id")}, vec_id) AS rk
       |  FROM assigned)
       |SELECT CAST(cluster AS BIGINT) AS cluster,
       |  CAST(csize AS BIGINT) AS csize,
       |  CAST(ceil(sqrt(CAST(csize AS DOUBLE))) AS BIGINT) AS quota,
       |  CAST(rk AS BIGINT) AS rk, vec_id
       |FROM sized
       |WHERE rk <= CAST(ceil(sqrt(CAST(csize AS DOUBLE))) AS BIGINT)
       |ORDER BY cluster, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_cluster_balanced_sample" -> q176 _,
    "q163_bitext_mining" -> q163 _,
    "q162_mmr_select" -> q162 _,
    "q158_pq_codebook" -> q158 _,
    "q160_pq_adc_knn" -> q160 _,
    "q159_embed_dim_stats" -> q159 _,
    "q171_embed_spectrum" -> q171 _,
    "q77_kmeans_train" -> q77 _,
    "q168_ann_maintenance" -> q168 _,
    "q143_cluster_silhouette" -> q143 _,
    "q58_knn_l2" -> q58 _,
    "q56_array_funcs" -> q56 _,
    "q54_embed_pipeline" -> q54 _,
    "q29_knn_brute" -> q29 _,
    "q30_ann_ivf" -> q30 _,
    "q36_embed_neardup" -> q36 _,
    "q37_srp_lsh_neardup" -> q37 _,
    "q115_embed_outliers" -> q115 _,
    "q116_knn_label_eval" -> q116 _,
    "q130_label_separation" -> q130 _,
    "q150_embed_diversity" -> q150 _,
    "q132_ann_ivf_multiprobe" -> q132 _,
    "q133_semdedup" -> q133 _,
    "q137_hard_negatives" -> q137 _)

  val oracles: Map[String, String] = Map(
    "q176_cluster_balanced_sample" -> q176Sql,
    "q163_bitext_mining" -> q163Sql,
    "q162_mmr_select" -> q162Sql,
    "q158_pq_codebook" -> q158Sql,
    "q160_pq_adc_knn" -> q160Sql,
    "q159_embed_dim_stats" -> q159Sql,
    "q171_embed_spectrum" -> q171Sql,
    "q77_kmeans_train" -> q77Sql,
    "q168_ann_maintenance" -> q168Sql,
    "q143_cluster_silhouette" -> q143Sql,
    "q58_knn_l2" -> q58Sql,
    "q56_array_funcs" -> q56Sql,
    "q54_embed_pipeline" -> q54Sql,
    "q29_knn_brute" -> q29Sql,
    "q30_ann_ivf" -> q30Sql,
    "q36_embed_neardup" -> q36Sql,
    "q37_srp_lsh_neardup" -> q37Sql,
    "q115_embed_outliers" -> q115Sql,
    "q116_knn_label_eval" -> q116Sql,
    "q130_label_separation" -> q130Sql,
    "q150_embed_diversity" -> q150Sql,
    "q132_ann_ivf_multiprobe" -> q132Sql,
    "q133_semdedup" -> q133Sql,
    "q137_hard_negatives" -> q137Sql)
}
