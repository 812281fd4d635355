package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Family-lifetime relation memos — "an index is built once and served
  * by its family" (the overlap-pair index consumed by q23/q134, the
  * MinHash signature table consumed by q22/q62/q136/q140; the
  * trained-centroid/codebook memos are the plain-driver-value cousins).
  *
  * Contract, one place instead of one copy per family (r9 review):
  *  - one LIVE entry per (family, session): keyed by the SparkSession
  *    OBJECT (reference equality — collision-free, unlike an identity
  *    hash code, and the served plan is always bound to the asking
  *    session) plus the corpus fingerprint
  *    ([[graft.sources.Tables.fingerprint]] — file sizes/mtimes);
  *  - supersede-and-release: a changed fingerprint (fixture
  *    regenerated in-session) unpersists the old index's blocks
  *    before building the new one, so N regenerations never
  *    accumulate N persisted tables;
  *  - self-heal: a harness-level `clearCache()` (Verify's per-query
  *    isolation backstop) unpersists the blocks out from under the
  *    memo; serving the now-uncached plan would recompute its
  *    subtree once per consumer branch, so the entry is rebuilt —
  *    an unpersisted index is never served;
  *  - stopped sessions are purged on every access, so the map is
  *    O(live sessions × families) and never pins a dead session.
  *
  * `build` must return an ALREADY persisted and eagerly materialized
  * DataFrame (families with staged builds — the overlap engine's
  * bucket cache — manage their intermediates inside `build`). These
  * persists are deliberately NOT CacheScope-registered: their
  * lifetime is the family's, not one query's (see the CacheScope
  * scaladoc's contract note).
  *
  * Synchronization is a single coarse lock held across builds: a
  * build is seconds of Spark jobs, but the alternative (lock-free
  * computeIfAbsent) holds a map-bin lock just the same, and two
  * concurrent queries of one family SHOULD serialize on the one
  * index build rather than race two copies. */
object FamilyIndex {

  private val memos =
    scala.collection.mutable.Map.empty[(String, SparkSession), (String, DataFrame)]

  def of(family: String, spark: SparkSession, fingerprint: String)
      (build: () => DataFrame): DataFrame = synchronized {
    memos.filterInPlace { case ((_, s), _) => !s.sparkContext.isStopped }
    val key = (family, spark)
    memos.get(key) match {
      case Some((fp, df)) if fp == fingerprint &&
          df.storageLevel != StorageLevel.NONE =>
        df
      case stale =>
        // superseded fingerprint → release the old blocks; NONE
        // storage level (self-heal) → old reference is already free
        stale.foreach { case (_, old) => old.unpersist(false) }
        val rebuilt = build()
        memos(key) = (fingerprint, rebuilt)
        rebuilt
    }
  }

  /** Live entry count — spec observability. */
  private[graft] def liveCount: Int = synchronized(memos.size)

  /** Live entries for `spark` whose blocks are actually persisted —
    * the set that can occupy executor storage (Bench's isolation
    * audit compares this against the persistent-RDD registry). */
  private[graft] def liveMaterializedCount(spark: SparkSession): Int =
    synchronized(memos.count { case ((_, s), (_, df)) =>
      (s eq spark) && df.storageLevel != StorageLevel.NONE
    })

  /** Retire every memo owned by `spark`: unpersist the index blocks
    * and drop the entries. The isStopped purge in [[of]] only fires
    * when the shared SparkContext stops, but session CLONES
    * (`spark.newSession()`) share one context — a long-lived JVM that
    * churns clone sessions (one per lane/tenant) would otherwise pin
    * each abandoned clone's SparkSession object and persisted blocks
    * until the whole context dies. A lane that retires its session
    * calls this; the single-session harnesses (Verify/Bench/specs)
    * never need to. Returns the number of entries released. */
  def release(spark: SparkSession): Int = synchronized {
    val owned = memos.collect { case (k @ (_, s), (_, df)) if s eq spark => (k, df) }
    owned.foreach { case (k, df) =>
      try df.unpersist(false)
      catch { case _: IllegalStateException => () /* context already stopped */ }
      memos.remove(k)
    }
    owned.size
  }
}
