package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the physical plans the 100 TB design
  * depends on, pinned so a refactor can't silently regress them.
  * (Values are checked by the DuckDB oracle; these check HOW.) */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q02: all predicates reach the parquet scan (PushedFilters)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("GreaterThan(l_discount,0.05)"),
      s"missing pushed filters:\n$p")
  }

  test("q01: aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("q05: all four dimension joins broadcast (no fact-side shuffle join)") {
    val p = plan("q05_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected SMJ at this scale:\n$p")
  }

  test("q51: custom top-k aggregator runs partially before the exchange") {
    val p = plan("q51_topk_aggregator")
    assert(p.contains("partial_topkbyprice"), s"no partial top-k:\n$p")
  }

  test("q12: exactly one hash-partitioning shuffle feeds the ranking window") {
    val p = plan("q12_topk_per_group")
    val hashExchanges = "hashpartitioning\\(".r.findAllIn(p).size
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n$p")
  }

  test("q21: dedup aggregates map-side, so the shuffle carries fingerprints not bodies") {
    val p = plan("q21_exact_dedup")
    // partial min/count before the exchange ⇒ shuffle rows are
    // (fingerprint, partial state), never raw document text
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"no map-side partial aggregation:\n$p")
  }

  test("q23/q134 overlap engine: pairs from bounded buckets (no self-join); sizes joins not hint-forced") {
    // Probed via the raw (un-memoized) builder — the family copy the
    // queries serve renders as an InMemoryTableScan, which hides the
    // join strategy from explain. Two halves:
    // (a) candidate pairs come from within-bucket expansion of the
    //     single (h1,h2) aggregate — the ONLY joins in the plan are
    //     the two that attach per-doc sizes at the very end;
    // (b) `sizes` is O(documents), so those joins must be UNHINTED:
    //     with auto-broadcast disabled on a cloned session the plan
    //     degrades to shuffle joins — nothing is hint-forced (the
    //     q154/q163 driver-OOM-class probe).
    val p = graft.operators.Dedup.overlapPairsPlan(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // count in the details section — "(id) JoinName" — one line per node
    val joins = "\\(\\d+\\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllIn(p).size
    assert(joins == 2, s"expected exactly the 2 size-attach joins, got $joins:\n$p")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val pNoBc = graft.operators.Dedup.overlapPairsPlan(s2, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!pNoBc.contains("BroadcastHashJoin"),
      s"a broadcast survives autoBroadcastJoinThreshold=-1 — hint-forced:\n$pNoBc")
  }

  test("q37/q54: candidate→vector fetch joins are not hint-forced broadcasts of the corpus") {
    // The fetch joins' vector side is the FULL normalized corpus; a
    // forced broadcast of it is the driver-OOM-at-100TB class. With
    // auto-broadcast disabled on a cloned session, no broadcast may
    // survive anywhere in either plan — AQE alone decides.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (q <- Seq("q37_srp_lsh_neardup", "q54_embed_pipeline")) {
      val pNoBc = SparkEntry.queries(q)(s2, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!pNoBc.contains("BroadcastHashJoin"),
        s"$q: a broadcast survives autoBroadcastJoinThreshold=-1 — hint-forced:\n$pNoBc")
    }
  }

  test("q37/q54: no all-pairs operator (banded LSH, not a corpus×corpus product)") {
    val p37 = plan("q37_srp_lsh_neardup")
    assert(!p37.contains("CartesianProduct") && !p37.contains("BroadcastNestedLoopJoin"),
      s"q37 contains an all-pairs join:\n$p37")
    // q54 legitimately keeps ONE nested-loop join: the IVF centroid
    // fan-out (corpus × nlist=8 — bounded by the centroid count, the
    // judged-fine q30 shape). What must never appear is a second one:
    // that would be the corpus×corpus dedup join this round removed.
    val p54 = plan("q54_embed_pipeline")
    assert(!p54.contains("CartesianProduct"), s"q54 cartesian:\n$p54")
    // formatted explain prints each node twice (tree + details) —
    // count only tree lines, "BroadcastNestedLoopJoin (<id>)"
    val bnlj = "BroadcastNestedLoopJoin \\(\\d+\\)".r.findAllIn(p54).size
    assert(bnlj <= 1, s"q54 has $bnlj nested-loop joins (corpus×corpus is back):\n$p54")
  }

  test("q36 (exact verifier) IS the all-pairs form — small-N only, by design") {
    // Inverse pin: if someone "fixes" q36 into a banded form it stops
    // being the independent ground truth the recall spec measures
    // against. Its nested-loop shape is intentional and documented.
    val p = plan("q36_embed_neardup")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      s"q36 no longer the brute-force verifier:\n$p")
  }

  test("q69/q70/q78: per-document corpus ops have NO shuffle before the presentation sort") {
    // These are the claimed zero-shuffle quality/chunking filters —
    // at 100 TB they must stay embarrassingly parallel. The only
    // exchange allowed is the final orderBy's range partitioning.
    for (q <- Seq("q69_doc_chunking", "q70_repetition_score", "q78_regex_scrub")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning("),
        s"$q shuffles before the presentation sort:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"$q grew a join:\n$p")
    }
  }

  test("q71: idf joins broadcast (vocabulary-sized), tf aggregate is two-phase") {
    val p = plan("q71_tfidf_topterms")
    assert(p.contains("BroadcastHashJoin"), s"idf join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-sized shuffle join appeared:\n$p")
    assert(p.contains("partial_count"), s"tf aggregate not map-side combined:\n$p")
  }

  test("q100: the vocabulary head comes from TakeOrdered, never a global sort") {
    val p = plan("q100_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k head must be per-partition top-k + merge:\n$p")
  }

  test("q89/q92: dimension/stats tables broadcast onto the fact side") {
    val p89 = plan("q89_ols_regression")
    assert(p89.contains("BroadcastHashJoin") && !p89.contains("SortMergeJoin"),
      s"part dim not broadcast:\n$p89")
    val p92 = plan("q92_zscore_anomaly")
    assert(p92.contains("BroadcastHashJoin"),
      s"per-type moment table not broadcast back onto hourly rollup:\n$p92")
  }

  test("q95: edge build broadcasts the supplier dim and never goes cartesian") {
    val p = plan("q95_triangle_count")
    assert(p.contains("BroadcastHashJoin"), s"supplier dim not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"triangle enumeration degenerated to a cartesian product:\n$p")
    // r12: all three report legs (nodes, edge count, triangles) read
    // the ONE cached ≤n(n+1)/2-row pair relation — the corpus must be
    // scanned only inside that cached subtree, never by a consumer.
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      s"report legs no longer served by the cached pair relation:\n$p")
    // Single corpus exchange: the ok-repartition satisfies both the
    // distinct and the self-join (subset rule), so the cached subtree
    // has exactly one shuffle of corpus-sized rows (by ok) plus the
    // tiny distinct-pairs exchange; the join's second side must be a
    // ReusedExchange of the first.
    assert(p.contains("ReusedExchange"),
      s"self-join sides no longer share the ok exchange:\n$p")
  }

  test("q76: bloom probe side has NO join — the filter arrives as a subquery") {
    // The entire point over q68: at bloom scale the bench set never
    // joins against the corpus. The probe plan must contain no join
    // operator at all; the filter is a scalar-subquery result reused
    // as a literal input to might_contain.
    val p = plan("q76_bloom_decontam")
    assert(!p.contains("Join"), s"q76 probe side grew a join:\n$p")
    assert(p.contains("Subquery") || p.contains("subquery"),
      s"bloom filter not delivered via scalar subquery:\n$p")
  }

  test("q113: BM25 prunes to query terms before any shuffle and takes top-k without a global sort") {
    val p = plan("q113_bm25_retrieval")
    // The term filter must sit under the tf aggregate (the shuffle
    // carries only matching tokens), df/stats join in as broadcasts,
    // and the ranked head is per-partition top-k + merge.
    assert(p.contains("TakeOrderedAndProject"), s"top-k became a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"df/corpus stats not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-sized shuffle join appeared:\n$p")
  }

  test("q115: per-dim moment table broadcasts; outlier head is TakeOrdered") {
    val p = plan("q115_embed_outliers")
    assert(p.contains("TakeOrderedAndProject"), s"top-k became a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"O(dim) stats not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-sized shuffle join appeared:\n$p")
  }

  test("q116: probe set broadcasts; corpus is never shuffle-joined") {
    val p = plan("q116_knn_label_eval")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-sized shuffle join appeared:\n$p")
  }

  test("q120: attribution candidates join on (user, time-bucket), never user alone") {
    // The q55 banded rewrite: joining purchases⋈touches on user_id
    // alone is |purchases|×|touches| per user — a bot-user key
    // explodes row counts AQE cannot repair. Every join whose keys
    // include user_id must also carry the 7-day bucket column.
    val p = plan("q120_attribution")
    val keyLines = p.linesIterator
      .filter(l => l.contains("keys") && l.contains("user_id")).toSeq
    assert(keyLines.nonEmpty, s"no user-keyed candidate join found:\n$p")
    assert(keyLines.forall(_.contains("bucket")),
      s"candidate join keys lack the time bucket:\n$p")
  }

  test("q116/q29/q12: rank-limit pushdown (WindowGroupLimit) holds the k-NN windows to O(groups×k)") {
    // The scaladoc claim "the window holds O(probes×k) rows" depends
    // on Spark 4's InferWindowGroupLimit pushing the rank filter into
    // a per-partition bounded top-k. A version bump that dropped the
    // rule would silently regress these to full per-group sorts —
    // pin the node in the physical plan.
    for (q <- Seq("q116_knn_label_eval", "q29_knn_brute", "q12_topk_per_group")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q lost the rank-limit pushdown (full per-group sort):\n$p")
    }
  }

  test("q124: composed capstone derives from ONE CC lineage — a single corpus scan, labels reused") {
    // ccLabels executes once during construction and is checkpointed;
    // the composed report's own plan must contain exactly one parquet
    // scan (the per-source corpus pass) plus the label RDD — a second
    // MinHash subtree here would mean the subplan sharing regressed to
    // q62/q121's standalone rebuilds.
    val p = plan("q124_dedup_capstone")
    // formatted explain prints each node twice (tree + details) —
    // count only tree lines, "Scan parquet  (<id>)"
    val scans = "Scan parquet\\s+\\(\\d+\\)".r.findAllIn(p).size
    assert(scans == 1, s"expected exactly 1 parquet scan, got $scans:\n$p")
    assert(p.contains("ExistingRDD"),
      s"checkpointed CC labels missing from the plan:\n$p")
  }

  test("q122: the corpus explodes exactly twice — scoring-side Generate + the checkpointed c2") {
    // The two-pass claim is structural: c2 is eagerly checkpointed, so
    // the final plan must show exactly ONE corpus scan and ONE bigram
    // Generate (the scoring side); c1/v/join all read the ExistingRDD.
    // Without the checkpoint the three c2 consumers were MEASURED to
    // re-explode the corpus 4x (their subtrees don't canonicalize
    // equal, so exchange reuse never fires).
    val p = plan("q122_bigram_lm_xent")
    val scans = "Scan parquet\\s+\\(\\d+\\)".r.findAllIn(p).size
    val gens = "Generate \\(\\d+\\)".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
    assert(gens == 1, s"expected 1 bigram Generate, got $gens:\n$p")
    assert(p.contains("ExistingRDD"), s"checkpointed c2 missing:\n$p")
  }

  test("q157: events scanned once into the cached key histogram; TakeOrdered top-10, no global sort") {
    // The stats row and the top-10 both derive from the same key
    // histogram, eagerly cached (their pruned subtrees don't
    // canonicalize equal, so exchange reuse never fires — a cache
    // regression means TWO corpus scans); and the top-10 must be a
    // bounded per-partition heap (TakeOrderedAndProject), never a
    // full sort of the key histogram.
    val p = plan("q157_skew_profile")
    // the cached histogram's plan renders once per InMemoryTableScan
    // consumer — count DISTINCT scan node ids, not text occurrences
    val scans = "Scan parquet\\s+\\((\\d+)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(scans.size == 1, s"expected 1 distinct events scan, got $scans:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"histogram cache missing from the plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no bounded top-k:\n$p")
  }

  test("q159: embeddings posexploded once into the cached 64-row moment relation") {
    // pv (per-dim stats) and tot (total variance) both consume the
    // 64-row moment aggregate, eagerly cached; a cache regression
    // means two corpus posexplode passes — double the only
    // corpus-sized work.
    val p = plan("q159_embed_dim_stats")
    // distinct scan node ids — the cached 64-row relation's plan
    // renders once per consumer (q157-pin rationale)
    val scans = "Scan parquet\\s+\\((\\d+)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(scans.size == 1,
      s"expected 1 distinct embeddings scan, got $scans:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"moment cache missing from the plan:\n$p")
  }

  test("q158: PQ assignment is join-free (CASE-over-codebooks argmin) over the cached corpus, map-combined cell aggregate") {
    // The codebooks are driver-side literals baked into a CASE
    // expression, so encoding must be a narrow projection — a Join
    // appearing here means someone rewrote assignment as a
    // codebook-table join (a per-row k×M-way shuffle amplification
    // at corpus scale). The 32-cell aggregate must combine map-side:
    // the only corpus-sized shuffle carries (subspace, code) partials.
    val p = plan("q158_pq_codebook")
    assert(!p.contains("Join"), s"unexpected join in PQ assignment:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"corpus cache missing from the plan:\n$p")
    val scans = "Scan parquet\\s+\\((\\d+)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(scans.size == 1,
      s"expected 1 distinct embeddings scan, got $scans:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"no map-side partial cell aggregation:\n$p")
    // r12: the per-codeword argmin is the LOOP-form fused
    // centroid_l2_best expression (codebooks ride the references
    // array), not k unrolled l2_distance(literal) structs — the
    // unrolled tree made every pqTrain iteration re-plan and
    // re-codegen a ~30x larger expression (measured
    // core-count-invariant 2.4 s solo; loop form 1.5 s).
    assert(p.contains("centroid_l2_best"),
      s"PQ assignment lost the loop-form centroid expression:\n$p")
  }

  test("q161: RRF legs end in bounded heads; fusion never ranks the corpus globally") {
    // Both legs must shortlist via TakeOrderedAndProject (bounded
    // per-partition heaps), the BM25 tf aggregate must combine
    // map-side, and no CartesianProduct may appear — the only
    // permitted cross joins are 1-row broadcast stats/probe sides.
    val p = plan("q161_hybrid_rrf")
    assert(p.contains("TakeOrderedAndProject"), s"no bounded leg head:\n$p")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cartesian product in the fusion path:\n$p")
  }

  test("q164: one user_id shuffle feeds both leads; bounded TakeOrdered head") {
    // Both lead() columns must ride the SAME window sort (a second
    // hashpartitioning on user_id means the window was split), and
    // the top-10 must be a bounded heap, not a global sort of the
    // pattern table.
    val p = plan("q164_seq_patterns")
    val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userExchanges == 1,
      s"expected 1 user_id exchange, got $userExchanges:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"no bounded top-k:\n$p")
  }

  test("q163: bitext pair build — size-conditional broadcast (unhinted), no cartesian") {
    // The pair join is deliberately UNHINTED (a forced broadcast of
    // the corpus-proportional target slice is the q154 driver-OOM
    // hazard). Pin both halves of the size-conditional contract:
    // (a) at this scale AQE's size estimate picks broadcast (avoiding
    //     the nlist-valued shuffle-key parallelism cap);
    // (b) with auto-broadcast disabled on a cloned session, the plan
    //     degrades to a shuffle join — i.e., nothing is hint-forced.
    val p = plan("q163_bitext_mining")
    assert(p.contains("BroadcastHashJoin"),
      s"AQE did not broadcast the small target slice at test scale:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in pair build:\n$p")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val pNoBc = SparkEntry.queries("q163_bitext_mining")(s2, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!pNoBc.contains("BroadcastHashJoin"),
      s"a broadcast survives autoBroadcastJoinThreshold=-1 — hint-forced:\n$pNoBc")
  }

  test("q160: PQ serving — narrow one-scan encoder, LUT probes broadcast, corpus never shuffles before the top-k") {
    // The encoded corpus is computed by ONE narrow scan (the M
    // argmins are a projection — a join-based encoder would shuffle
    // the corpus M times) and MATERIALIZED (InMemoryTableScan) before
    // the serving join — without that boundary the measured plan
    // re-evaluated the 32-distance encode per candidate PAIR, a
    // ×|probes| blow-up. The O(Q·M·k) probe LUTs must BROADCAST onto
    // it (nested-loop, since the probe predicate is an inequality); a
    // SortMergeJoin or extra scan here means the serving path started
    // paying corpus-sized shuffles for a lookup-table computation.
    val p = plan("q160_pq_adc_knn")
    val scans = "Scan parquet\\s+\\((\\d+)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(scans.size == 1,
      s"expected 1 distinct embeddings scan, got $scans:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"encoded table not materialized before the serving join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"probe LUTs not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus-shuffling join in the ADC path:\n$p")
  }

  test("q166: probes broadcast onto one embeddings scan (q29 serving shape); decode stays in mapPartitions") {
    // The probe side is constant-bounded (doc_id < 10), so it must
    // broadcast (BNLJ — the probe fan-out has no equi-key); the
    // embedding corpus must stream through exactly one scan with no
    // shuffle-based cartesian anywhere.
    val p = plan("q166_crossmodal_knn")
    assert(p.contains("BroadcastNestedLoopJoin"), s"probes not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"shuffle cartesian in serving path:\n$p")
    // exactly 2 distinct scans: documents (probes) + embeddings (corpus)
    val scans = "Scan parquet\\s+\\((\\d+)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(scans.size == 2,
      s"expected 2 distinct scans (documents probes + embeddings corpus), got $scans:\n$p")
    assert(p.contains("MapPartitions"), s"media decode left the mapPartitions stage:\n$p")
    assert(p.contains("LessThan(doc_id,10)"),
      s"probe filter not pushed to the documents scan:\n$p")
    assert(p.contains("IsNotNull(text)"),
      s"null-text probe filter (shared 3-tier contract) not pushed:\n$p")
  }

  test("q87: posting-list head is a partial (map-side) bounded top-k, not a per-term window") {
    // A Window.partitionBy(term) fully sorts each term's posting list
    // — a skew cliff on hot stop-terms at scale. The bounded
    // TopKPostings Aggregator must aggregate partially before the
    // term shuffle so a hot term ships at most k rows per map task.
    val p = plan("q87_inverted_index")
    assert(!p.contains("Window"), s"per-term window is back:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"typed top-k aggregator missing from the plan:\n$p")
    assert(p.contains("partial_topkpostings") || p.contains("partial_TopKPostings"),
      s"posting-list top-k is not map-side partial:\n$p")
  }

  test("q126: pair expansion runs over the vocabulary aggregate, never the corpus") {
    // The BPE-trainer scale trick (TextAnalysis.q126 scaladoc): the
    // corpus is exploded to tokens ONCE and aggregated to vocab
    // counts; the within-token character-pair Generate consumes that
    // aggregate, so its cost is O(|V|·len) regardless of corpus size.
    // If a refactor moved the pair explode corpus-side, the quadratic
    // work would scale with tokens, not types — this pin catches it.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate}
    val qe = SparkEntry.queries("q126_bpe_merge_pairs")(spark, sf).queryExecution
    val pairGens = qe.optimizedPlan.collect {
      case g: Generate if g.generatorOutput.exists(_.name == "pair") => g
    }
    assert(pairGens.size == 1,
      s"expected exactly one pair Generate:\n${qe.optimizedPlan}")
    assert(pairGens.head.collect { case a: Aggregate => a }.nonEmpty,
      s"pair Generate must sit ABOVE the vocab Aggregate:\n${qe.optimizedPlan}")
    val p = plan("q126_bpe_merge_pairs")
    assert(p.contains("TakeOrderedAndProject"),
      s"head selection must be TakeOrdered, not a global sort:\n$p")
  }

  test("q127: the corpus-side rate join broadcasts — document rows never shuffle") {
    // The scale claim: pass 2 is one codegen'd scan with the md5 test
    // fused, joined to the O(sources) rate table by BROADCAST; the
    // only exchanges carry O(sources) rollups. A sort-merge or
    // shuffled-hash join here would shuffle the full corpus on
    // `source` — ~20 hot keys, the worst possible skew.
    val p = plan("q127_mixture_rebalance")
    assert(p.contains("BroadcastHashJoin"), s"rate join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus shuffled on the ~20-key source column:\n$p")
  }

  test("q131: the corpus is tokenized once — both sig consumers read the persisted relation") {
    // sig (the distinct shingle relation) is consumed by the df
    // aggregate AND the join-back with different exchange shapes, so
    // exchange reuse can't fire; without the persist the corpus-wide
    // tokenize+md5 flatMap ran twice (measured: 2 SerializeFromObject
    // subtrees). The pin: every consumer reads the InMemory cache,
    // and no flatMap runs OUTSIDE a cached-relation rendering.
    try {
      val p = plan("q131_crossdoc_ngram_dup")
      val scans = "InMemoryTableScan \\(\\d+\\)".r.findAllIn(p).size
      assert(scans >= 2, s"expected both sig consumers on the cache:\n$p")
      // formatted explain re-renders the cached flatMap subtree once
      // per InMemoryRelation (tree + details = 2 matches each; 4
      // total for the 2 consumers). A flatMap running OUTSIDE the
      // cache — a third consumer built from a fresh shingles() call —
      // adds matches beyond that.
      val fm = "SerializeFromObject \\(\\d+\\)".r.findAllIn(p).size
      assert(fm <= 4, s"a shingle flatMap runs outside the cache:\n$p")
    } finally spark.catalog.clearCache() // even on failure — a leaked
      // cache would perturb every later plan-shape assertion
  }

  test("q128: one corpus pass — moments aggregate map-side with a single source exchange") {
    // All three signals are doc-local, so the whole query must be a
    // single scan feeding a two-phase aggregate; more than one scan
    // or a join would mean a signal left the codegen'd pass.
    val p = plan("q128_signal_correlation")
    assert(p.contains("partial_"), s"no map-side partial moments:\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    // formatted explain prints each node twice (tree + details) — the
    // tree line is "Scan parquet  (<id>)", the detail header is
    // "(<id>) Scan parquet"; count tree lines only (q37/q54 pattern).
    val scans = "Scan parquet\\s*\\(\\d+\\)".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 corpus scan, got $scans:\n$p")
  }

  test("q30/q132: IVF serving — narrow argmax assignment, pruned broadcast probe side, no cluster-key shuffle join") {
    // The r7 plan audit caught the window-based assignment exchanging
    // the corpus TWICE and the probe join degenerating to a
    // SortMergeJoin on the nlist-valued cluster key (≤ nlist active
    // reducers at 100 TB). The rewritten shape must hold: (a) zero
    // SMJ/ShuffledHashJoin — the tiny probe side broadcasts; (b) the
    // probe-side scan is vec_id-PRUNED at parquet (the probe filter
    // pushes below the narrow assignment); (c) exactly one
    // hashpartitioning exchange (the per-query top-k window), i.e.
    // assignment itself shuffles nothing.
    for (q <- Seq("q30_ann_ivf", "q132_ann_ivf_multiprobe")) {
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q probe join must broadcast, not shuffle on the nlist-valued key:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q probe side not broadcast:\n$p")
      assert(p.contains("GreaterThanOrEqual(vec_id,8)") && p.contains("LessThan(vec_id,28)"),
        s"$q probe filter not pushed to the parquet scan:\n$p")
      val hashExchanges = "hashpartitioning\\(".r.findAllIn(p).size
      assert(hashExchanges == 1,
        s"$q: expected 1 hash exchange (top-k window), got $hashExchanges — assignment is shuffling:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"$q per-query head lost the rank-limit pushdown:\n$p")
    }
    // r12: q132's probe side picks its NProbe=2 cells via array_min +
    // best-excluded array_min (the q143 form) — a full array_sort of
    // the (negcos, c_id) structs is O(nlist log nlist) INTERPRETED
    // comparisons per evaluation and measured 3.84 → 0.66 s at the sf1
    // decade when nlist = 313.
    assert(!plan("q132_ann_ivf_multiprobe").contains("array_sort"),
      "q132 probe side regressed to a full array_sort of the centroid scores")
  }

  test("ivf-assign family index serves q30/q133/q37: posting lists from cache, no per-consumer re-assignment") {
    // r11 verdict item 2: q30/q132/q133/q163/q37/q54 used to each
    // recompute the narrow argmax assignment per query (~2 s × 4 at
    // sf1). Served from the ivf-assign FamilyIndex, a consumer's
    // CORPUS leg must read the persisted posting relation
    // (InMemoryTableScan) and must not re-evaluate the centroid
    // scoring expression over the corpus. Formatted explain EXPANDS
    // the InMemoryRelation's cached build plan, so the build's own
    // centroid site is visible inside every consumer — the pin is
    // therefore RELATIVE: a consumer may carry exactly the index's
    // own site count (its cached subtree), plus one for q30's
    // deliberate vec_id-pruned probe-side projection; anything more
    // is a corpus re-assignment.
    val fmt = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val idx = graft.operators.Similarity.ivfAssignIndex(spark, sf)
    def sites(p: String) = "centroid_negcos_best".r.findAllIn(p).size
    val base = sites(idx.queryExecution.explainString(fmt))
    val p133 = plan("q133_semdedup")
    assert(p133.contains("InMemoryTableScan"),
      s"q133 corpus leg not served from the ivf-assign index:\n$p133")
    assert(sites(p133) == base,
      s"q133 has ${sites(p133)} centroid sites vs the index's $base — re-assigning:\n$p133")
    val p37 = plan("q37_srp_lsh_neardup")
    assert(p37.contains("InMemoryTableScan") && sites(p37) == base,
      s"q37 has ${sites(p37)} centroid sites vs the index's $base — re-assigning:\n$p37")
    val p30 = plan("q30_ann_ivf")
    assert(p30.contains("InMemoryTableScan"),
      s"q30 corpus leg not served from the ivf-assign index:\n$p30")
    // the probe-side argmax prints in TWO Project details (the
    // withColumn and the q_id-aliasing projection) — a corpus-side
    // re-assignment would add two more on top of these
    assert(sites(p30) <= base + 2,
      s"q30 has ${sites(p30)} centroid sites (index $base + 2 probe prints expected):\n$p30")
    // q176 rides the same index: one InMemoryTableScan, no
    // re-assignment, and its two windows (cell count + hash rank)
    // share a single cluster-keyed exchange — the whole query adds
    // exactly one shuffle over the served posting lists.
    val p176 = plan("q176_cluster_balanced_sample")
    assert(p176.contains("InMemoryTableScan") && sites(p176) == base,
      s"q176 has ${sites(p176)} centroid sites vs the index's $base — re-assigning:\n$p176")
    // Count only exchanges ABOVE the cached build subtree (formatted
    // explain expands the InMemoryRelation's own plan below it).
    val above176 =
      if (p176.contains("InMemoryRelation")) p176.take(p176.indexOf("InMemoryRelation")) else p176
    val shuffles = "Exchange hashpartitioning\\(cluster".r.findAllIn(above176).size
    assert(shuffles <= 1, s"q176 windows do not share one cluster exchange:\n$p176")
  }

  test("q174: CM sketch — map-combined bigram count; top-k via TakeOrdered, never a global sort; codegen'd bigram pass") {
    val p = plan("q174_countmin_heavy")
    // The corpus-sized stage (bigram counting) must combine map-side —
    // the shuffle carries (gram, partial count), ~vocab rows per task.
    assert(p.contains("partial_count"), s"bigram count not map-combined:\n$p")
    // The published head comes from a distributed TakeOrdered — the
    // vocabulary is never globally sorted (the 20-row rank window that
    // follows is the only unpartitioned window, over 20 rows).
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$p")
    // The bigram emission stays in whole-stage codegen (no
    // higher-order-function CodegenFallback in the hot path).
    assert(!p.contains("transform("), s"HOF transform crept back into the bigram pass:\n$p")
  }

  test("q175: dup-span scrub — the span shuffle carries 32-hex fingerprints with doc/pos, never document text") {
    val p = plan("q175_dupspan_scrub")
    // One window exchange keyed on the md5 span hash; by that point
    // the projection is (doc_id, pos, h) — text and the token array
    // must already be gone from every exchange. Formatted explain
    // puts each Exchange's row schema on the `Input [...]` line of
    // its numbered detail block.
    assert(p.contains("hashpartitioning(h#"),
      s"span window not keyed on the fingerprint:\n$p")
    val exchangeInputs = "(?m)^\\(\\d+\\) Exchange\\nInput [^\\n]*".r.findAllIn(p).toSeq
    assert(exchangeInputs.nonEmpty, s"no exchange detail blocks parsed:\n$p")
    // `[t#` catches the token array in first position, `, t#` elsewhere.
    assert(exchangeInputs.forall(b =>
      !b.contains("text#") && "[\\[, ]t#".r.findFirstIn(b).isEmpty),
      s"an exchange carries document text or the token array:\n${exchangeInputs.mkString("\n")}")
  }

  test("q179: boilerplate scrub exchanges carry unit sigs, never text; doc-sig relation cached once for its two consumers") {
    val p = plan("q179_boilerplate_scrub")
    // Every exchange moves (source, sig, doc_id, counts) — by the
    // first shuffle the projection must already have dropped text
    // and the token array (same contract as q21/q175).
    val exchangeInputs = "(?m)^\\(\\d+\\) Exchange\\nInput [^\\n]*".r.findAllIn(p).toSeq
    assert(exchangeInputs.nonEmpty, s"no exchange detail blocks parsed:\n$p")
    assert(exchangeInputs.forall(b =>
      !b.contains("text#") && "[\\[, ]t#".r.findFirstIn(b).isEmpty),
      s"an exchange carries document text or the token array:\n${exchangeInputs.mkString("\n")}")
    // The (source, sig, doc) relation serves both the DF aggregate
    // and the join-back from the cache, so the tokenize+md5 corpus
    // pass runs once.
    assert(p.contains("InMemoryTableScan"),
      s"doc-sig relation not served from cache:\n$p")
    assert(!p.contains("CodegenFallback"), s"fallback in the hot path:\n$p")
  }

  test("q181: CDC dedup ships each doc's tokens through at most the one doc_id slicing join; sig stages carry sigs only") {
    val p = plan("q181_cdc_dedup")
    val exchangeBlocks = "(?m)^\\(\\d+\\) Exchange\\nInput [^\\n]*".r.findAllIn(p).toSeq
    assert(exchangeBlocks.nonEmpty, s"no exchange detail blocks parsed:\n$p")
    assert(exchangeBlocks.forall(b => !b.contains("text#")),
      s"an exchange carries raw document text:\n${exchangeBlocks.mkString("\n")}")
    // The token array may cross ONLY the slicing join's doc_id
    // exchange — one copy of each doc, like a repartition; the span
    // window and both sig stages must be token-free. The formatted
    // plan repeats the cached build subtree per consumer, so count
    // DISTINCT t-carrying blocks.
    val tCarrying = exchangeBlocks.filter(b => "[\\[, ]t#".r.findFirstIn(b).isDefined).distinct
    assert(tCarrying.size <= 1,
      s"more than one distinct exchange carries the token array:\n${tCarrying.mkString("\n")}")
    assert(p.contains("InMemoryTableScan"),
      s"chunk relation not served from cache:\n$p")
    // r12: the keeper count is derived FROM the sig aggregate (keepers
    // grouped by their doc_id), never by re-joining the chunk stream on
    // sig — exactly one distinct sig-keyed exchange, carrying partial
    // min-structs. A second one means the join-back form crept back and
    // the chunk stream ships twice.
    val sigKeyed = "hashpartitioning\\(sig#\\d+".r.findAllIn(p).toSeq.distinct
    assert(sigKeyed.size == 1,
      s"expected exactly 1 distinct sig-keyed exchange, got ${sigKeyed.size}:\n$p")
  }

  test("q177: passage report rides ONE span derivation; the excerpt join broadcasts the 10-row report") {
    val p = plan("q177_dup_passages")
    // The run merge + top-k must come from a single exploded-span
    // subtree: exactly one exchange keyed on the md5 span hash (a
    // second one would mean the spanFrames sharing broke and the
    // corpus-sized explode runs twice).
    val spanKeyed = "hashpartitioning\\(h#".r.findAllIn(p).size
    assert(spanKeyed == 1, s"expected 1 span-hash exchange, got $spanKeyed:\n$p")
    // Top-k is a TakeOrdered (no materialized global sort of runs),
    // and the excerpt join back to the token arrays broadcasts the
    // 10-row report — the text side must never shuffle.
    assert(p.contains("TakeOrderedAndProject"), s"runs top-k fully sorts:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"excerpt join does not broadcast:\n$p")
    val exchangeInputs = "(?m)^\\(\\d+\\) Exchange\\nInput [^\\n]*".r.findAllIn(p).toSeq
    assert(exchangeInputs.forall(b => !b.contains("text#")),
      s"an exchange carries document text:\n${exchangeInputs.mkString("\n")}")
  }

  test("q178: ONE corpus scan feeds the cached sketches; the udaf aggregates map-side; pairs are array exprs, no membership join") {
    try {
      val p = plan("q178_kmv_source_overlap")
      // The sketch table feeds both pair-join sides — the scopedCache
      // must collapse that to one materialized sketch build over one
      // documents scan; two distinct scan ids = the double corpus
      // read this pin exists to prevent.
      val scans = "Scan parquet\\s+\\((\\d+)\\)".r
        .findAllMatchIn(p).map(_.group(1)).toSet
      assert(scans.size == 1, s"expected 1 distinct documents scan, got $scans:\n$p")
      assert(p.contains("InMemoryTableScan"),
        s"sketch cache missing from the plan:\n$p")
      // The bounded Aggregator must combine partially map-side — the
      // whole point of the KMV shuffle shape (≤ k rows per source per
      // map task, enforced by ObjectHashAggregate partial functions).
      assert(p.contains("ObjectHashAggregate") && p.contains("partial_"),
        s"KMV aggregation not map-side combined:\n$p")
      // r12: the estimator is per-pair ARRAY expressions over the two
      // k-bounded sketch arrays — the only join left is the single
      // sa < sb pair enumeration (S-row sides, broadcast nested loop
      // by construction); the old row form's membership hash joins,
      // (sa,sb,gram,h) aggregate and rank window must stay gone (each
      // was a full small-stage round-trip for kilobytes of data).
      val loops = "(?m)^\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(loops == 1, s"expected exactly the pair enumeration to nest, got $loops:\n$p")
      assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
        s"a membership join reappeared — the array form needs none:\n$p")
      assert(!p.contains("Window"),
        s"a rank window reappeared — slice(array_sort(...)) replaces it:\n$p")
    } finally {
      graft.functions.CacheScope.drain()
      spark.catalog.clearCache()
    }
  }

  test("q114: sparse KL — per-token source map, no sort-merge, never the dense |V|·S² grid") {
    // The zero-zero tail is closed-form (z·term0), so the plan must
    // carry only OBSERVED (source, tok) rows. r9 replaced the
    // two-sided expansion + FULL-OUTER sort-merge (the measured hot
    // stage) with ONE tok-keyed aggregate building a {source → c}
    // map and a narrow explode into the ordered-pair cells. Pinned:
    // (a) no sort-merge/shuffled-hash join anywhere (the union cells
    //     are built without joining two corpus-expansion streams);
    // (b) no join keyed on tok alone — the dense self-join's
    //     signature — and no cartesian;
    // (c) the per-token map aggregate + its explode exist (Generate
    //     over the map keys).
    val p = plan("q114_source_kl")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"a corpus-expansion join is back:\n$p")
    assert(!"keys \\[1\\]: \\[tok#".r.findFirstIn(p).isDefined,
      s"a join keyed on tok alone = the dense self-join is back:\n$p")
    assert(!p.contains("CartesianProduct"), s"q114 cartesian:\n$p")
    assert(p.contains("map_from_entries") || p.contains("collect_list"),
      s"per-token source map gone:\n$p")
    assert(p.contains("Generate"), s"map-keys explode gone:\n$p")
  }

  test("q137: probe side broadcasts with the vec_id filter pushed; rank-limit pushdown holds") {
    // The label inequality is the ONLY join condition, so this is a
    // BroadcastNestedLoopJoin by construction — the correct shape
    // here: ~20 probes broadcast and each corpus row loops over them
    // (the same O(probes × corpus) the brute-force family documents);
    // what the pin forbids is the probe side NOT broadcasting.
    val p = plan("q137_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("BroadcastExchange"),
      s"probe side not broadcast:\n$p")
    assert(p.contains("LessThan(vec_id,20)"),
      s"probe filter not pushed to the parquet scan:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-probe head lost the rank-limit pushdown:\n$p")
    assert(!p.contains("CartesianProduct"), s"q137 cartesian:\n$p")
  }

  test("q138: bucket meta broadcasts; admission window is bucket-local, never per-source") {
    // The scale point of the two-pass formulation: pass 2's window
    // partitions by (source, score) — bucket-local sorts — and the
    // candidate-bucket table arrives broadcast. A window partitioned
    // by source ALONE is the per-source global sort the design avoids.
    val p = plan("q138_token_budget")
    assert(p.contains("BroadcastHashJoin"), s"bucket meta not broadcast:\n$p")
    // The corpus-side admission window must PARTITION on both source
    // and score (rendered "source#X, score#Y, doc_id#ZL ASC" — the
    // third element is its ORDER key). Pass 1's bucket-cum window
    // renders "source#X, score#Y DESC" (score is its ORDER key, not a
    // partition key), so a bare source+score regex would match it and
    // make this pin vacuous — require the doc_id order key too.
    val corpusWin = "windowspecdefinition\\(source#\\d+, score#\\d+, doc_id#\\d+L ASC".r
    assert(corpusWin.findFirstIn(p).isDefined,
      s"admission window is not (source, score)-partitioned:\n$p")
    // And the per-source skew bomb must not return: no window may
    // order corpus rows by doc_id with source as its ONLY partition key.
    val perSourceWin = "windowspecdefinition\\(source#\\d+, doc_id#\\d+L".r
    assert(perSourceWin.findFirstIn(p).isEmpty,
      s"a source-only admission window is back:\n$p")
  }

  test("q139: normalized dedup shuffles signatures, not bodies (map-side partials)") {
    val p = plan("q139_normalized_dedup")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"no map-side partial aggregation:\n$p")
    assert(!p.contains("Join"), s"q139 should be join-free:\n$p")
  }

  test("q147: df spectrum is join-free with a map-combined df aggregate") {
    val p = plan("q147_df_spectrum")
    assert(p.contains("partial_count"), s"df aggregate not map-side combined:\n$p")
    assert(!p.contains("Join"), s"q147 should be join-free:\n$p")
  }

  test("q148: fertility is one corpus scan into a map-combined grid aggregate") {
    val p = plan("q148_tokenizer_fertility")
    // Formatted explain renders each node twice (tree + numbered
    // details) — count the numbered detail entries.
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"more than one scan:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no map-side partials:\n$p")
    assert(!p.contains("Join"), s"q148 should be join-free:\n$p")
  }

  test("q149: global interleave positions come from the closed form, never a single-partition sort") {
    // The design claim: the counts table arrives broadcast (the
    // crossJoin renders BroadcastNestedLoopJoin), its expansion is
    // collapsed by map-side partial aggregation BEFORE the shuffle,
    // and NO stage ever coalesces the corpus to one partition — a
    // naive global row_number would show "SinglePartition" here.
    val p = plan("q149_curriculum_interleave")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"per-source counts not broadcast:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"broadcast expansion not collapsed map-side:\n$p")
    assert(!p.contains("SinglePartition"),
      s"a single-partition (global-sort) stage crept in:\n$p")
  }

  test("q151: the context-length sweep is one scan × literal explode, join-free") {
    val p = plan("q151_ctx_length_sweep")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"more than one scan:\n$p")
    assert(p.contains("Generate"), s"the ×|L| expansion is not an explode:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no map-side partials:\n$p")
    assert(!p.contains("Join"), s"q151 should be join-free:\n$p")
  }

  test("q152: delta dedup shuffles 32-hex signatures, never document bodies") {
    // The scale claim: the base corpus reaches the join only as its
    // DISTINCT signature index, and every exchange key is the sig —
    // text must never be a shuffle key.
    val p = plan("q152_delta_dedup")
    assert("hashpartitioning\\(sig#\\d+".r.findFirstIn(p).isDefined,
      s"no sig-keyed exchange:\n$p")
    assert("hashpartitioning\\(text#\\d+".r.findFirstIn(p).isEmpty,
      s"document bodies are a shuffle key:\n$p")
    assert(p.contains("partial_"), s"no map-side partials:\n$p")
  }

  test("q153: the k-anonymity audit is one scan into a map-combined QID aggregate, join-free") {
    val p = plan("q153_kanonymity_audit")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"more than one scan:\n$p")
    assert(p.contains("partial_count"), s"QID aggregate not map-side combined:\n$p")
    assert(!p.contains("Join"), s"q153 should be join-free:\n$p")
  }

  test("q170: one corpus scan feeds the t-closeness audit; all joins are on the domain-bounded aggregate") {
    // The only corpus-sized operation is the first (type, day, band)
    // aggregate (map-side combined); the grid joins and the EMD
    // window run on that cached domain-bounded relation — a second
    // parquet scan or a shuffle keyed on raw event columns would
    // mean corpus-sized work leaked past the aggregate.
    val p = plan("q170_tcloseness_audit")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"more than one parquet scan:\n$p")
    assert(p.contains("partial_count"), s"first aggregate not map-side combined:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"grid consumers do not read the cached aggregate:\n$p")
  }

  test("q169: the BPE encode is one scan, join-free, with both aggregates map-side combined") {
    // The trained merge table rides into the plan as literals (a
    // driver memo, O(k) rows) and the k rewrites compose into one
    // projection over the (source, tok) aggregate — a join against a
    // merge-table relation or a second corpus scan would mean the
    // model is being treated as data.
    val p = plan("q169_bpe_encode")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"more than one scan:\n$p")
    assert(!p.contains("Join"), s"q169 should be join-free:\n$p")
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      s"aggregates not map-side combined:\n$p")
  }

  test("q154: prefix join keyed on sig; verification joins are NOT hint-forced broadcasts") {
    // The r7 verdict's one scale flag: q154 used to broadcast(cand)
    // unconditionally, but the candidate-pair table is
    // data-dependent-size (it grows with the corpus near-dup rate) —
    // at 100 TB an unconditional driver broadcast of it is the
    // job-killer. The fix leaves the strategy to Catalyst/AQE. Pin
    // both halves of that contract:
    // (a) with auto-broadcast DISABLED the verification joins must
    //     degrade to shuffle joins — a hint-forced broadcast would
    //     survive the conf and fail here;
    // (b) with default conf the plan stays sound (sig-keyed prefix
    //     exchange, no all-pairs product).
    // Both structural probes run on q154Plan — the un-memoized twin
    // (same code path as the memo build): the real q154 serves its
    // universe + prefix indexes from family memos, which render as
    // InMemoryTableScans and hide the join strategies from explain
    // (the overlapPairsPlan precedent).
    try {
      // The no-broadcast probe runs on a CLONED session (own SQLConf,
      // shared context/cache): flipping autoBroadcastJoinThreshold on
      // the shared session would leak into concurrently-planning
      // suites and silently degrade their unhinted joins.
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pNoBc = graft.operators.Dedup.q154Plan(s2, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!pNoBc.contains("BroadcastHashJoin") &&
        !pNoBc.contains("BroadcastExchange"),
        s"a broadcast survives autoBroadcastJoinThreshold=-1 — the join " +
          s"strategy is hint-forced, not size-conditional:\n$pNoBc")
      val p = graft.operators.Dedup.q154Plan(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert("hashpartitioning\\(sig#\\d+".r.findFirstIn(p).isDefined ||
        "hashpartitioning\\(doc_b#\\d+L, sig#\\d+".r.findFirstIn(p).isDefined,
        s"no sig-keyed exchange for the prefix join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"an all-pairs product crept in:\n$p")
      // The REAL q154 must read the family-memo indexes (universe fed
      // to both verification legs, prefix to both self-join sides),
      // not rebuild them inline.
      val pReal = plan("q154_prefix_ssjoin")
      val cached = "InMemoryTableScan \\(\\d+\\)".r.findAllIn(pReal).size
      assert(cached >= 3, s"verification legs + prefix self-join should " +
        s"read the memo-served indexes:\n$pReal")
      assert(!pReal.contains("CartesianProduct") &&
        !pReal.contains("BroadcastNestedLoopJoin"),
        s"an all-pairs product crept into the served plan:\n$pReal")
    } finally {
      graft.functions.CacheScope.drain()
      spark.catalog.clearCache()
    }
  }

  test("q144: fully memo-served; estimate→verify stays candidate-bounded") {
    // The suite's second-most-expensive query had no pin (r7 item #6);
    // since r10 its cost model is INDEX READS ONLY: the signature
    // table + candidates come from the MinHash family memo and the
    // exact leg fetches per-doc signature arrays from the uncapped
    // shingle-docsigs memo — the query itself creates no caches and
    // runs no tokenize. A refactor that re-derives shingles inline
    // shows up as a SerializeFromObject OUTSIDE the cached
    // renderings; joins stay bounded by the LSH candidate set, never
    // a corpus product.
    try {
      val p = plan("q144_minhash_calibration")
      val cachedReads = "InMemoryTableScan \\(\\d+\\)".r.findAllIn(p).size
      assert(cachedReads >= 4,
        s"sig a/b + array legs should read the family memos:\n$p")
      // Each InMemoryRelation rendering prints the cached flatMap
      // subtree twice (tree + details) — q131's accounting. Matches
      // beyond 2·renderings mean a tokenize escaped the caches.
      val renders = "InMemoryRelation \\(\\d+\\)".r.findAllIn(p).size
      val fm = "SerializeFromObject \\(\\d+\\)".r.findAllIn(p).size
      assert(fm <= 2 * math.max(renders, 1),
        s"a shingle flatMap runs outside the memo caches ($fm flatMaps, " +
          s"$renders cached renderings):\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"an all-pairs product crept in:\n$p")
    } finally {
      graft.functions.CacheScope.drain()
      spark.catalog.clearCache()
    }
  }

  test("q155: the l-diversity audit stays one scan with map-side partials, join-free") {
    val p = plan("q155_ldiversity_audit")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"more than one scan:\n$p")
    assert(p.contains("partial_"), s"no map-side partials:\n$p")
    assert(!p.contains("Join"), s"q155 should be join-free:\n$p")
  }

  test("q156: skyline is decided on the domain-bounded grid; frontier broadcasts back, no pairwise product") {
    val p = plan("q156_pareto_skyline")
    // The cell grid is persisted, so the corpus parquet appears at
    // most once (inside the cached lineage) — a second scan means
    // the one-pass claim regressed.
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size <= 1,
      s"corpus scanned more than once:\n$p")
    assert(p.contains("partial_max"), s"grid max not map-side combined:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"frontier not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the naive dominance product crept in:\n$p")
  }

  test("q150: diversity is one corpus pass of map-combined moments, no pairwise join") {
    val p = plan("q150_embed_diversity")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1,
      s"more than one scan:\n$p")
    assert(p.contains("partial_sum"), s"moment sums not map-side combined:\n$p")
    assert(!p.contains("Join"), s"q150 must never build a pairwise join:\n$p")
  }
}
