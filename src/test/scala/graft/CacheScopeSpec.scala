package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle pin for the per-query cache scope (r7 verdict item #2):
  * every operator persist registers with CacheScope, and one drain()
  * releases exactly the caches the query created — so a 156-query
  * session never accumulates CacheManager entries (the mechanism
  * behind late-roster eviction churn under memory pressure). */
class CacheScopeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val sf = "/root/testdata/sf0.001"

  private def cachedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("a persisting query registers its caches; drain releases them all") {
    graft.functions.CacheScope.drain() // clean slate
    spark.catalog.clearCache()
    val before = cachedRddCount
    // q23's bounded-bucket engine persists its bucket relation during
    // construction (eager count) — a known scoped-cache creator.
    val df = SparkEntry.queries("q23_ngram_jaccard")(spark, sf)
    df.count()
    assert(graft.functions.CacheScope.liveCount >= 1,
      "the query's persist did not register with CacheScope")
    assert(cachedRddCount > before, "nothing was actually cached")
    graft.functions.CacheScope.drain()
    assert(graft.functions.CacheScope.liveCount == 0, "registry not cleared")
    // unpersist(blocking=false) removes the RDD from the persistent
    // map synchronously (only block deletion is async), so the count
    // must be back at the baseline immediately.
    assert(cachedRddCount <= before,
      s"drain left cached RDDs behind: $cachedRddCount > $before")
  }

  test("drain is idempotent and safe across inline-managed caches") {
    graft.functions.CacheScope.drain()
    // lloydTrain's input persist is BOTH inline-unpersisted (its
    // try/finally) and scope-registered — the second release must be
    // a harmless no-op.
    SparkEntry.queries("q77_kmeans_train")(spark, sf).count()
    graft.functions.CacheScope.drain()
    graft.functions.CacheScope.drain() // second drain: no-op, no throw
    assert(graft.functions.CacheScope.liveCount == 0)
    spark.catalog.clearCache()
  }
}
