package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle pin for the per-query cache scope (r7 verdict item #2):
  * every operator persist registers with CacheScope, and one drain()
  * releases exactly the caches the query created — so a 156-query
  * session never accumulates CacheManager entries (the mechanism
  * behind late-roster eviction churn under memory pressure).
  *
  * Assertions deliberately avoid GLOBAL state (persistent-RDD counts,
  * post-drain liveCount == 0): suites run concurrently in one JVM, so
  * any other spec's scoped caches show up in context-wide counters.
  * Everything here is checked on the entries this spec's own queries
  * registered, by storage level. */
class CacheScopeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val sf = "/root/testdata/sf0.001"

  test("a persisting query registers its caches; drain releases those entries") {
    // q35 persists its SimHash signature table during construction
    // (eager count) — a known scoped-cache creator. (q23, q22, and
    // then q144 — the previous subjects — moved their persists to the
    // family-lifetime index memos, which are deliberately NOT
    // CacheScope-registered.)
    val df = SparkEntry.queries("q35_simhash_neardup")(spark, sf)
    df.count()
    val regs = graft.functions.CacheScope.liveSnapshot
    assert(regs.nonEmpty,
      "the query's persist did not register with CacheScope")
    assert(regs.exists(_.storageLevel != StorageLevel.NONE),
      "nothing registered was actually cached")
    graft.functions.CacheScope.drain()
    // Assert on THIS spec's snapshot entries transitioning to NONE —
    // never on the global freed count, which races a concurrent
    // suite's own drain() between our snapshot and our drain().
    regs.foreach { ds =>
      assert(ds.storageLevel == StorageLevel.NONE,
        "a snapshot entry is still cached after drain()")
    }
  }

  test("checkpointRdds extracts the backing RDD of a checkpointed relation; release frees its blocks") {
    // The checkpoint-scope mechanism, tested via its handles: a
    // localCheckpoint'ed Dataset exposes exactly its persisted
    // backing RDD (the LogicalRDD), a plain plan exposes none, and
    // unpersisting through the handle frees the blocks — the same
    // release drainCheckpoints() performs. The GLOBAL drain itself is
    // deliberately NOT called here: drains release every registered
    // checkpoint process-wide and this suite runs concurrently with
    // suites whose queries hold live checkpoints (the exact race the
    // CacheScope scaladoc forbids); only the serialized harnesses
    // (Bench/Verify/DevProbe) may call it.
    import org.apache.spark.storage.StorageLevel
    val plain = spark.range(50).toDF("id")
    assert(graft.functions.CacheScope.checkpointRdds(plain).isEmpty,
      "a plain plan must expose no checkpoint RDDs")
    val ck = plain.localCheckpoint(true)
    val rdds = graft.functions.CacheScope.checkpointRdds(ck)
    assert(rdds.size === 1, s"expected the one backing RDD, got ${rdds.size}")
    assert(rdds.head.getStorageLevel != StorageLevel.NONE,
      "checkpointed RDD not persisted")
    assert(spark.sparkContext.getPersistentRDDs.contains(rdds.head.id),
      "backing RDD missing from the persistent-RDD registry")
    rdds.head.unpersist(blocking = true)
    assert(!spark.sparkContext.getPersistentRDDs.contains(rdds.head.id),
      "release did not remove the RDD from the persistent registry")
  }

  test("drain is idempotent and safe across inline-managed caches") {
    // lloydTrain's input persist is BOTH inline-unpersisted (its
    // try/finally) and scope-registered — the second release must be
    // a harmless no-op (unpersist of an unpersisted dataset).
    SparkEntry.queries("q77_kmeans_train")(spark, sf).count()
    graft.functions.CacheScope.drain()
    graft.functions.CacheScope.drain() // second drain: no-op, no throw
    spark.catalog.clearCache()
  }
}
