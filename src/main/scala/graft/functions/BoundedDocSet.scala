package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded distinct-set collector for document-frequency cutoffs
  * (operators/Dedup q23): per group, keep the set of distinct ids —
  * but only up to `maxKeep + 1` of them (the smallest, kept sorted).
  *
  * The point is the bound, not the order: a df-cutoff needs "all ids
  * if there are ≤ T of them, else PROOF there are more than T".
  * Collecting `collect_set` first and filtering after would
  * materialize an unbounded buffer for exactly the hot keys the
  * cutoff exists to drop (a stop-phrase shingle at 100 TB has df in
  * the 10⁸ range — that's an OOM, not a bucket). This buffer never
  * exceeds T+1 longs, the merge is a bounded sorted-union, and Spark
  * runs it as a partial (map-side) aggregate — so the shuffle carries
  * at most T+1 ids per (key, map task) no matter how hot the key.
  *
  * Contract: groups whose result has size ≤ maxKeep are COMPLETE
  * distinct-id sets (sorted ascending); size == maxKeep + 1 means
  * "df > maxKeep" and the caller drops the group. Results for kept
  * groups are deterministic (set semantics + sort); overflow groups
  * retain the smallest ids seen, also deterministic.
  */
class BoundedDocSet(maxKeep: Int) extends Aggregator[Long, Seq[Long], Seq[Long]]
    with Serializable {
  private val cap = maxKeep + 1

  override def zero: Seq[Long] = Vector.empty

  // reduce runs once per input ROW of the suite's hottest aggregate
  // (every shingle occurrence in the corpus feeds it), so it exploits
  // the buffer invariant — sorted ascending, distinct, length ≤ cap —
  // for a binary-search membership test and a single-array positional
  // insert instead of contains + sort (O(log cap + cap), one
  // allocation). merge runs once per partition pair; the simple form
  // is fine there.
  override def reduce(b: Seq[Long], x: Long): Seq[Long] = {
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < x) lo = mid + 1 else hi = mid
    }
    if (lo < b.length && b(lo) == x) b // present
    else if (lo >= cap) b // would sort beyond the cap — dropped anyway
    else {
      val n = math.min(b.length + 1, cap)
      val out = new Array[Long](n)
      var i = 0
      while (i < lo) { out(i) = b(i); i += 1 }
      out(lo) = x
      var j = lo + 1
      while (j < n) { out(j) = b(j - 1); j += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(cap)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object BoundedDocSet {
  /** Untyped-column entry point usable inside `groupBy(...).agg(...)`. */
  def bounded_doc_set(maxKeep: Int)(c: Column): Column =
    udaf(new BoundedDocSet(maxKeep)).apply(c)
}
