package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One hashed set element inside a KMV (k-minimum-values) sketch:
  * the element's uniform hash and the element itself (kept so hash
  * ties break deterministically and so the sketch's members can be
  * intersected by value downstream). */
case class HashedGram(h: Long, gram: String)

/** Bounded bottom-k-by-hash aggregate — the KMV sketch builder behind
  * q178 and its streaming twin. Keeps the k DISTINCT smallest
  * (h, gram) elements per group; duplicates of an element already in
  * the buffer are no-ops, so the corpus-sized input needs NO separate
  * distinct pass before the aggregation (and the streaming path,
  * which cannot chain distinct into a stateful agg, shares the exact
  * same machinery).
  *
  * Why an Aggregator instead of the rank-window form the oracle uses:
  * a `row_number() OVER (PARTITION BY source ORDER BY h)` shuffles
  * EVERY distinct gram to its source's reducer; this buffer is
  * mergeable, so Spark aggregates partially map-side and the shuffle
  * carries at most k rows per source per map task — per-source state
  * is k hashes no matter the corpus (that is the point of KMV).
  * Buffer is a k-bounded sorted array with binary-search reject on
  * the per-row path, the [[BoundedDocSet]] discipline.
  */
class BottomKByHash(k: Int)
    extends Aggregator[HashedGram, Seq[HashedGram], Seq[HashedGram]]
    with Serializable {

  private val ord: Ordering[HashedGram] =
    Ordering.by((x: HashedGram) => (x.h, x.gram))

  override def zero: Seq[HashedGram] = Vector.empty

  // reduce runs once per bigram OCCURRENCE (the corpus-sized stage
  // feeds it with no distinct pass — that is the design), so it
  // exploits the buffer invariant — sorted by (h, gram), distinct,
  // length ≤ k — the same way [[BoundedDocSet.reduce]] does: binary
  // search locates x; a duplicate or an element ranking past a full
  // buffer's kth member returns the buffer untouched (the dominant
  // cases once a source saturates), and an insert is one positional
  // array copy. merge runs once per partition pair; the simple form
  // is fine there.
  override def reduce(b: Seq[HashedGram], x: HashedGram): Seq[HashedGram] = {
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(b(mid), x) < 0) lo = mid + 1 else hi = mid
    }
    if (lo < b.length && b(lo) == x) b // present
    else if (lo >= k) b // ranks past the kth of a full buffer
    else {
      val n = math.min(b.length + 1, k)
      val out = new Array[HashedGram](n)
      var i = 0
      while (i < lo) { out(i) = b(i); i += 1 }
      out(lo) = x
      var j = lo + 1
      while (j < n) { out(j) = b(j - 1); j += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  override def merge(a: Seq[HashedGram], b: Seq[HashedGram]): Seq[HashedGram] =
    (a ++ b).distinct.sorted(ord).take(k)

  override def finish(b: Seq[HashedGram]): Seq[HashedGram] = b

  override def bufferEncoder: Encoder[Seq[HashedGram]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[HashedGram]] = ExpressionEncoder()
}

object BottomKByHash {
  def apply(k: Int): BottomKByHash = new BottomKByHash(k)
  implicit val hashedGramEncoder: Encoder[HashedGram] = Encoders.product[HashedGram]
}
