package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Contract pins for the family-lifetime index memo (r9): build-once,
  * supersede-and-release, self-heal. Uses throwaway families so it
  * never collides with the operators' real entries. */
class FamilyIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  /** Distinct tag per build: Dataset.storageLevel (and unpersist) are
    * PLAN-keyed in the CacheManager, so two builds of an identical
    * plan would alias one cache entry and the assertions below would
    * observe the wrong entry. Real family builds re-read a parquet
    * path whose files changed, so their rebuilt plans never alias the
    * superseded entry's data either. */
  private def freshIndex(tag: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    val df = spark.range(100).toDF("id").withColumn("tag", lit(tag))
      .persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    df
  }

  test("same (family, session, fingerprint) builds once and serves the cached relation") {
    var builds = 0
    def get() = graft.functions.FamilyIndex.of("spec-family-a", spark, "fp1") { () =>
      builds += 1; freshIndex(s"a$builds")
    }
    val a = get(); val b = get()
    assert(builds === 1, "second access rebuilt an unchanged index")
    assert(a eq b, "second access served a different object")
    assert(b.storageLevel != StorageLevel.NONE, "served index not cached")
  }

  test("a changed fingerprint supersedes: old blocks released, new index served") {
    var builds = 0
    def get(fp: String) = graft.functions.FamilyIndex.of("spec-family-b", spark, fp) { () =>
      builds += 1; freshIndex(fp)
    }
    val old = get("fp1")
    val next = get("fp2")
    assert(builds === 2, "regenerated fingerprint did not rebuild")
    assert(!(old eq next), "superseded entry still served")
    assert(old.storageLevel == StorageLevel.NONE,
      "superseded index's blocks were not released — the N-regenerations leak")
    assert(next.storageLevel != StorageLevel.NONE)
  }

  test("release(session) retires a clone's memos without touching its siblings'") {
    // Session clones share one SparkContext, so the isStopped purge
    // never fires for an abandoned clone — release() is the lane-
    // retirement hook (r9 ADVICE). The clone's entries must drop AND
    // unpersist; the parent session's entry must survive untouched.
    val clone = spark.newSession()
    val parentIdx = graft.functions.FamilyIndex.of("spec-family-d", spark, "fp1") { () =>
      freshIndex("d-parent")
    }
    val cloneIdx = graft.functions.FamilyIndex.of("spec-family-d", clone, "fp1") { () =>
      freshIndex("d-clone")
    }
    assert(!(parentIdx eq cloneIdx), "clone shared the parent's entry — keying broke")
    val before = graft.functions.FamilyIndex.liveCount
    val released = graft.functions.FamilyIndex.release(clone)
    assert(released === 1, s"expected exactly the clone's one entry, got $released")
    assert(graft.functions.FamilyIndex.liveCount === before - 1)
    assert(cloneIdx.storageLevel == StorageLevel.NONE,
      "released clone index still holds persisted blocks")
    assert(parentIdx.storageLevel != StorageLevel.NONE,
      "release(clone) dropped the parent session's blocks")
    // A later access by the clone self-heals by rebuilding, not by
    // serving a retired relation.
    var rebuilt = false
    val again = graft.functions.FamilyIndex.of("spec-family-d", clone, "fp1") { () =>
      rebuilt = true; freshIndex("d-clone-2")
    }
    assert(rebuilt && !(again eq cloneIdx))
    graft.functions.FamilyIndex.release(clone)
  }

  test("corpus regeneration invalidates EVERY family memo: no stale cross-serve, no block leak") {
    // End-to-end over the REAL dedup families (r10 verdict item 6):
    // the memos key individually by (family, fingerprint), so the
    // contract that one corpus rewrite invalidates ALL of them is
    // emergent, not structural — prove it by running the memo-backed
    // queries, rewriting the corpus files in place, and re-running.
    // Stale cross-serve would reproduce the first run's numbers
    // exactly; a leak would grow the materialized-entry count.
    import org.apache.spark.sql.functions.{col, sum}
    val dir = java.nio.file.Files.createTempDirectory("graft_famregen").toString
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val embs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    embs.write.mode("overwrite").parquet(dir + "/embeddings.parquet")
    // q22 builds the minhash-sig memo; q154 builds ssjoin-universe/
    // prefix/docsigs; q133 builds ivf-assign (and the trained-
    // centroid driver memo behind it) — five family indexes over the
    // temp corpus.
    def run(): (Long, Long, Long, Long) = try {
      (SparkEntry.queries("q22_minhash_lsh")(spark, dir).count(),
        SparkEntry.queries("q154_prefix_ssjoin")(spark, dir).count(),
        SparkEntry.queries("q21_exact_dedup")(spark, dir).count(),
        SparkEntry.queries("q133_semdedup")(spark, dir)
          .agg(sum("n_members")).collect()(0).getLong(0))
    } finally graft.functions.CacheScope.drain()
    val before = run()
    val matBefore = graft.functions.FamilyIndex.liveMaterializedCount(spark)
    assert(matBefore >= 5, s"expected the 5 family memos live, saw $matBefore")
    Thread.sleep(1100) // defeat mtime granularity in the fingerprint
    docs.filter(col("doc_id") < 250)
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    embs.filter(col("vec_id") < 250)
      .write.mode("overwrite").parquet(dir + "/embeddings.parquet")
    val after = run()
    // q21's report is one row per surviving doc — deterministic 250 on
    // the regenerated half-corpus; a stale memo would still say 500.
    assert(after._3 === 250L,
      s"q21 reported ${after._3} docs after regeneration — stale memo serve")
    // q133's membership rollup counts every cosine-space vector once:
    // a stale ivf-assign (or centroid) memo would still roll up the
    // full 500-vector corpus.
    assert(after._4 <= 250L && after._4 > 0L,
      s"q133 rolled up ${after._4} members after regeneration — stale ivf-assign serve")
    assert(after !== before, "regenerated corpus reproduced old results")
    val matAfter = graft.functions.FamilyIndex.liveMaterializedCount(spark)
    assert(matAfter === matBefore,
      s"superseded family blocks leaked: $matBefore -> $matAfter")
  }

  test("self-heal: an externally unpersisted index is rebuilt, never served uncached") {
    var builds = 0
    def get() = graft.functions.FamilyIndex.of("spec-family-c", spark, "fp1") { () =>
      builds += 1; freshIndex(s"c$builds")
    }
    val served = get()
    served.unpersist(blocking = true) // simulate a harness clearCache()
    val healed = get()
    assert(builds === 2, "uncached index was served instead of rebuilt")
    assert(healed.storageLevel != StorageLevel.NONE, "healed index not cached")
  }
}
