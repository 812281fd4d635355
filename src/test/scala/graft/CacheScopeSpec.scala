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

  test("a persisting query registers its caches; drain releases at least those entries") {
    graft.functions.CacheScope.drain() // clean slate for the snapshot
    // q23's bounded-bucket engine persists its bucket relation during
    // construction (eager count) — a known scoped-cache creator.
    val df = SparkEntry.queries("q23_ngram_jaccard")(spark, sf)
    df.count()
    val regs = graft.functions.CacheScope.liveSnapshot
    assert(regs.nonEmpty,
      "the query's persist did not register with CacheScope")
    assert(regs.exists(_.storageLevel != StorageLevel.NONE),
      "nothing registered was actually cached")
    // drain must release every entry registered at snapshot time (a
    // concurrent suite may have added MORE since — hence >=, not ==)
    val freed = graft.functions.CacheScope.drain()
    assert(freed >= regs.size,
      s"drain released $freed entries but ${regs.size} were registered")
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
