package graft.functions

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Per-query cache lifecycle for the operators' query-local persists.
  *
  * Why this exists: an operator that feeds one intermediate relation
  * to several consumers persists it (signature tables, token streams,
  * candidate buckets — always fingerprint-sized, never corpus bytes)
  * so the expensive subtree runs once. But `Dataset.persist` registers
  * the plan in the session's CacheManager, which holds a STRONG
  * reference — unlike `localCheckpoint`'d RDD blocks, the entry is
  * never garbage-collected. Across a 156-query benchmark session the
  * caches accumulate and late-roster queries pay eviction churn under
  * storage-memory pressure; on a long-lived 100 TB cluster session the
  * same mechanism is a slow executor-storage leak.
  *
  * The fix is a cache SCOPE: `scopedCache` persists exactly like the
  * old call sites (MEMORY_AND_DISK) and additionally registers the
  * dataset; the harness (Verify / Bench / DevProbe / specs) calls
  * [[drain]] after fully consuming each query's result, releasing
  * every cache that query created. Within the query's own execution
  * the cache behaves identically — the scope only bounds its LIFETIME
  * to the query that created it.
  *
  * Operators with a tighter lifecycle than "the enclosing query" keep
  * managing it inline (`lloydTrain`'s try/finally, `ccLabels`'
  * edges.unpersist) — draining a second time is a no-op because
  * unpersist is idempotent and the registry clears on drain.
  *
  * Thread-safety: registration and drain synchronize on the registry;
  * concurrent queries (the FAIR-scheduler capability lanes) each
  * register safely, and the harnesses drain between queries, not
  * concurrently with them.
  *
  * CONTRACT — drains are process-global and must be serialized with
  * query execution: a drain issued while another query is mid-flight
  * releases that query's registered caches too. Correctness survives
  * (Spark recomputes), but the persist is silently defeated and the
  * double-scan plans the PlanShape pins guard against come back at
  * runtime, where the pins can't see them. Every harness in this repo
  * (Verify, Bench, DevProbe, the specs) already drains only BETWEEN
  * fully-consumed queries; a future concurrent multi-query driver must
  * either keep that discipline or scope its own registry per lane.
  * (Family-lifetime persists — the overlap-pair index, trained-model
  * memos — are deliberately NOT registered here; their owners manage
  * their lifetime.)
  */
object CacheScope {

  private val live = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Persist `ds` at MEMORY_AND_DISK and register it for the next
    * [[drain]]. Returns `ds` so call sites chain exactly like the
    * `.persist(...)` they replace. */
  def register[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    synchronized { live += ds }
    ds
  }

  /** Release every cache registered since the last drain. Non-blocking
    * unpersist: the executors free the blocks asynchronously while the
    * driver moves to the next query. Idempotent per entry. Returns the
    * number of entries released (spec observability — the harnesses
    * discard it). */
  def drain(): Int = {
    val toFree = synchronized {
      val snapshot = live.toList
      live.clear()
      snapshot
    }
    toFree.foreach { ds =>
      try ds.unpersist(blocking = false)
      catch { case _: IllegalStateException => () /* session already stopped */ }
    }
    toFree.size
  }

  // ---- localCheckpoint scope ----------------------------------------
  //
  // The operators' eager localCheckpoints (CC labels, q119's hourly
  // rollup, q122's bigram counts, q130's power sums, the PageRank
  // edge/node tables) have NO CacheManager entry: catalog.clearCache
  // never touches their blocks, and reclamation falls to the
  // ContextCleaner — which only runs when the driver happens to GC, so
  // across a 166-query bench the blocks accumulate and skew later
  // queries' storage. The registry below gives SERIALIZED harnesses
  // (Bench, Verify, DevProbe — one query fully consumed at a time)
  // deterministic release.
  //
  // CONTRACT — stricter than [[drain]]: a released checkpoint does
  // NOT recompute (its lineage was truncated at materialization), so
  // [[drainCheckpoints]] must only run between fully-consumed queries
  // in a harness that serializes them. The parallel spec suites must
  // NOT call it — a drain from suite A would hard-kill a checkpointed
  // relation suite B is still consuming (caches survive that race by
  // recomputing; checkpoints throw). Specs and library users keep the
  // ContextCleaner backstop: blocks free when the plan is GC'd.

  // WEAK references: a session that never calls drainCheckpoints (the
  // parallel spec suites, plain library users) must keep the full
  // ContextCleaner behavior — a strong registry reference would pin
  // every checkpointed RDD and defeat the GC-driven backstop.
  private val liveCheckpoints =
    scala.collection.mutable.ArrayBuffer.empty[java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]

  /** The localCheckpoint-backed RDDs inside `ds`'s analyzed plan —
    * shared by [[registerCheckpoint]] and the CC loop's round
    * supersede (which frees superseded rounds directly, since nothing
    * outside the loop can reference them). */
  private[graft] def checkpointRdds(ds: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Register a MATERIALIZED localCheckpoint'ed dataset's blocks for
    * release at the next [[drainCheckpoints]]. Returns `ds` so call
    * sites chain like the `.localCheckpoint(...)` they wrap. */
  def registerCheckpoint[T](ds: Dataset[T]): Dataset[T] = {
    val rdds = checkpointRdds(ds)
      .map(r => new java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]](r))
    synchronized { liveCheckpoints ++= rdds }
    ds
  }

  /** Release every checkpoint registered since the last call (entries
    * the ContextCleaner already collected deref to null and are
    * skipped). See the section contract above: serialized harnesses
    * only. Returns the number of RDDs actually unpersisted. */
  def drainCheckpoints(): Int = {
    val toFree = synchronized {
      val snapshot = liveCheckpoints.toList
      liveCheckpoints.clear()
      snapshot
    }
    toFree.count { ref =>
      Option(ref.get()).exists { r =>
        try { r.unpersist(blocking = false); true }
        catch { case _: Exception => false /* context already stopped */ }
      }
    }
  }

  /** Number of registered-but-undrained checkpoints — observability. */
  def liveCheckpointCount: Int = synchronized(liveCheckpoints.size)

  /** Number of registered-but-undrained caches — spec observability. */
  def liveCount: Int = synchronized(live.size)

  /** Snapshot of the registered datasets — spec observability (lets a
    * spec assert on the entries IT created by storage level, without
    * racing other suites' global persistent-RDD traffic). */
  private[graft] def liveSnapshot: List[Dataset[_]] = synchronized(live.toList)

  /** Chained form: `df.scopedCache` reads like the `.persist(...)` it
    * replaces at the operator call sites. */
  implicit final class Ops[T](private val ds: Dataset[T]) extends AnyVal {
    def scopedCache: Dataset[T] = CacheScope.register(ds)
  }
}
