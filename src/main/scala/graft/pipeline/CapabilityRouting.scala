package graft.pipeline

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** A named scheduling lane with a capacity contract — the Spark
  * analog of one capability entry in the reference's worker pool.
  *
  * Reference semantics (`maps/dispatch.go:144-167`): a worker
  * connects and advertises the list of mapper IDs it can run
  * (`Begin.Id` → `Worker.maps`); the dispatcher keeps one
  * `actionPool` per mapper ID (`dispatch.go:115-121`) and hands each
  * mapper's work only to workers registered under that ID. The
  * capability list is how heterogeneous workers (say, one host with
  * a decoder library installed) receive only the work they can do.
  *
  * Spark-first mapping: executors are uniform by default, so the
  * per-capability *routing* seam moves from worker selection to
  * scheduler lanes — a FAIR-scheduler pool per capability class,
  * with `weight`/`minShare` as the capacity contract (a pool with
  * minShare n is guaranteed n cores whenever it has work, the moral
  * equivalent of "n workers advertise this mapper"). Jobs opt into a
  * lane with a thread-local property, exactly as the reference's
  * mappers name their pool by ID. For genuinely heterogeneous
  * *hardware* (GPU decode stages), the cluster-mode analog is a
  * stage-level `ResourceProfile` — same idea, resource-typed — which
  * requires dynamic allocation on a real cluster manager and is
  * documented rather than exercised here (local mode only admits the
  * default profile).
  */
final case class PoolSpec(name: String, weight: Int = 1, minShare: Int = 0,
    schedulingMode: String = "FIFO")

object CapabilityRouting {

  /** Render the FAIR-scheduler allocations XML for a capability
    * registry — the `WorkerPool.Register` analog: one `<pool>` per
    * capability class. Pass the returned path as
    * `spark.scheduler.allocation.file` (with
    * `spark.scheduler.mode=FAIR`) at session build time. */
  def writeAllocationsFile(pools: Seq[PoolSpec]): String = {
    val xml = pools.map { p =>
      s"""  <pool name="${p.name}">
         |    <schedulingMode>${p.schedulingMode}</schedulingMode>
         |    <weight>${p.weight}</weight>
         |    <minShare>${p.minShare}</minShare>
         |  </pool>""".stripMargin
    }.mkString("<?xml version=\"1.0\"?>\n<allocations>\n", "\n", "\n</allocations>\n")
    val f: Path = Files.createTempFile("graft-pools", ".xml")
    Files.writeString(f, xml)
    f.toFile.deleteOnExit()
    f.toString
  }

  /** Run `body`'s Spark jobs in the named pool. The pool property is
    * thread-local (inherited by jobs the thread submits), so
    * concurrent pipelines on different threads route to different
    * lanes — the dispatch-time counterpart of
    * `getAndRemoveWorker(mapperID, ...)` picking from the mapper's
    * own pool. Restores the previous lane on exit so nesting works. */
  def inPool[T](spark: SparkSession, pool: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", pool)
    try body finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }
}
