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
}
