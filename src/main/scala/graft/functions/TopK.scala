package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (key, price) candidate inside a group. */
case class KeyedPrice(group: Long, key: Long, price: Double)

/** Bounded top-k aggregate: keeps the k largest (price, then smallest
  * key on ties) rows per group in the aggregation buffer.
  *
  * Why this exists next to the window-function top-k (q12): a window
  * `row_number` shuffles EVERY row to its group's reducer and sorts
  * the whole partition; this Aggregator is mergeable, so Spark runs
  * it map-side (partial) first and the shuffle carries at most k rows
  * per group per map task — at 100 TB with small k that is orders of
  * magnitude less shuffle volume, the same trick as
  * `TakeOrderedAndProject` but per group. Buffer is a k-bounded sorted
  * list (k is small; insertion is O(k)).
  */
class TopKByPrice(k: Int) extends Aggregator[KeyedPrice, Seq[KeyedPrice], Seq[KeyedPrice]]
    with Serializable {

  private def ord: Ordering[KeyedPrice] =
    Ordering.by((x: KeyedPrice) => (-x.price, x.key))

  override def zero: Seq[KeyedPrice] = Nil

  override def reduce(b: Seq[KeyedPrice], x: KeyedPrice): Seq[KeyedPrice] =
    ((b :+ x).sorted(ord)).take(k)

  override def merge(a: Seq[KeyedPrice], b: Seq[KeyedPrice]): Seq[KeyedPrice] =
    (a ++ b).sorted(ord).take(k)

  override def finish(b: Seq[KeyedPrice]): Seq[KeyedPrice] = b

  override def bufferEncoder: Encoder[Seq[KeyedPrice]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[KeyedPrice]] = ExpressionEncoder()
}

object TopKByPrice {
  def apply(k: Int): TopKByPrice = new TopKByPrice(k)
  implicit val keyedPriceEncoder: Encoder[KeyedPrice] = Encoders.product[KeyedPrice]
}

/** One (term-frequency, document) candidate for a posting-list head. */
case class Posting(tf: Long, doc_id: Long)

/** Bounded posting-list head: keeps the k (tf DESC, doc_id ASC)
  * largest postings per term and finishes to the comma-joined doc_id
  * string q87's index report emits.
  *
  * Why this replaces q87's per-term rank window: hot stop-terms
  * ("the") put a whole corpus's posting list in ONE window partition,
  * which the window must fully sort to keep 3 rows — the classic skew
  * cliff at 100x. This Aggregator is mergeable, so Spark aggregates
  * partially map-side and the shuffle carries at most k rows per term
  * per map task regardless of term frequency; the hot term costs the
  * same as any other. Registered with `functions.udaf`, it
  * participates in the same hash aggregate as plain count/sum columns.
  */
class TopKPostings(k: Int) extends Aggregator[Posting, Seq[Posting], String]
    with Serializable {

  private def ord: Ordering[Posting] =
    Ordering.by((p: Posting) => (-p.tf, p.doc_id))

  override def zero: Seq[Posting] = Nil

  override def reduce(b: Seq[Posting], x: Posting): Seq[Posting] =
    ((b :+ x).sorted(ord)).take(k)

  override def merge(a: Seq[Posting], b: Seq[Posting]): Seq[Posting] =
    (a ++ b).sorted(ord).take(k)

  override def finish(b: Seq[Posting]): String =
    b.map(_.doc_id).mkString(",")

  override def bufferEncoder: Encoder[Seq[Posting]] = ExpressionEncoder()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object TopKPostings {
  def apply(k: Int): TopKPostings = new TopKPostings(k)
  implicit val postingEncoder: Encoder[Posting] = Encoders.product[Posting]
}
