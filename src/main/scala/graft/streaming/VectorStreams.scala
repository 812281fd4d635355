package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** A vector's band-signature occurrence arriving on the stream,
  * carrying its frozen-centroid IVF cell (the batch `ivf-assign`
  * posting relation's cluster, recomputed per arrival by the same
  * narrow argmax expression). */
case class VecArrival(vec_id: Long, ts: java.sql.Timestamp,
    v: Seq[Double], cluster: Long, band_idx: Int, band_val: String)

/** A confirmed near-duplicate pair (vec_a < vec_b, exact cosine ≥
  * threshold) emitted by [[VectorStreams.nearDupPairStream]]. */
case class NearDupPair(vec_a: Long, vec_b: Long)

/** One vector retained in a band bucket's state window. */
case class BucketMember(vec_id: Long, v: Seq[Double], tsMs: Long)

/** One cross-modal retrieval hit emitted by
  * [[VectorStreams.crossModalTopKStream]] — the q166 row shape. */
case class CrossModalHit(doc_id: Long, rank: Long, vec_id: Long, cos: Double)

/** One cell's live maintenance row emitted by
  * [[VectorStreams.annMaintenanceStream]] — the q168 online shape. */
case class CellDrift(cluster: Long, n_base: Long, n_new: Long, drifted: Long)

/** State of one (band_idx, band_val) bucket: the vectors seen within
  * the watermark window. */
case class BucketState(members: List[BucketMember])

/** Streaming twin of the CELL-SCOPED banded SRP-LSH near-dup
  * detector (the q37 / q54 candidate+confirm stage) — the last
  * batch⇔stream parity gap in the dedup family (row dedup:
  * EventStreams.dedupStream; chunk dedup:
  * CorpusStreams.chunkDedupStream; mixture enforcement:
  * CorpusStreams.rebalanceStream).
  *
  * Vectors arrive as an unbounded stream; each is assigned to its
  * IVF Voronoi cell against the FROZEN trained centroids (the
  * annMaintenanceStream posture: train offline, serve online —
  * `Similarity.centStructs`, the batch family's own argmax
  * expression, so stream and batch can never cell a vector
  * differently), then expands through the SAME `Similarity.bandSigs`
  * banding as the batch query (one shared definition — the two
  * paths cannot plane, band, or hash differently), lands in its 12
  * (cell, band) buckets, and is compared by EXACT cosine against
  * every bucket member seen within the watermark window. Cell
  * scoping is also the streaming SKEW fix: a hot low-entropy band
  * bucket is bounded by its Voronoi cell's window population, not
  * the whole stream's (the r11 sf1 lesson — global banding at an
  * exploratory threshold is non-selective, so its buckets grow with
  * the corpus). A pair crossing the threshold is emitted once per
  * colliding band (the batch stage has the same multi-band
  * multiplicity pre-`distinct`; consumers set-collapse, as the spec
  * does). The in-bucket cosine loop accumulates left-to-right in
  * double precision — the exact order of the native `cosine_sim`
  * codegen — so stream and batch agree bitwise on every threshold
  * decision.
  *
  * Guarantee (the one a 100 TB streaming near-dup detector actually
  * provides): a pair whose two vectors arrive within the watermark
  * delay of each other is detected; a wider-spaced pair is not (its
  * earlier member has been GC'd) — detect-within-window, the
  * standard trade that bounds state. State per bucket is
  * O(members-in-window × dim) doubles — the honest cost of streaming
  * LSH (the batch path holds only signatures because it can re-scan
  * the corpus for vectors; a stream cannot re-scan, so the window's
  * vectors live in the store). Hot buckets (low-entropy bands) are
  * the skew risk, bounded by the same watermark GC: every member
  * ages out `delayMs` after its event time, via per-member pruning
  * inside the group function plus an event-time timeout that drops
  * whole idle buckets.
  *
  * Determinism: within a micro-batch, bucket arrivals process in
  * vec_id order, so a doc-ordered replay emits the same pair set
  * regardless of partition scheduling (StreamingSpec pins stream ≡
  * batch pair-set parity over a 2-batch replay). */
object VectorStreams {

  implicit val vecEnc: Encoder[VecArrival] = Encoders.product[VecArrival]
  implicit val pairEnc: Encoder[NearDupPair] = Encoders.product[NearDupPair]
  implicit val stateEnc: Encoder[BucketState] = Encoders.product[BucketState]
  implicit val keyEnc: Encoder[(Long, Int, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.STRING)

  /** Schema of the vector stream (ts = ingest event time). */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("ts", TimestampType),
    StructField("embedding", ArrayType(DoubleType))))

  /** Exactly CosineSimilarity.nullSafeEval's accumulation order —
    * sequential left-to-right dot and norms, then
    * dot / (sqrt(nx) * sqrt(ny)) — so every stream-side threshold
    * decision is bit-identical to the batch plan's. */
  private def cosine(x: Array[Double], y: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Watermarked streaming near-dup detection over the vector
    * stream. Emits [[NearDupPair]]s (multi-band duplicates included,
    * as the batch candidate stage pre-`distinct`); both vectors must
    * arrive within `delayMs` of each other to be detected. Applies
    * the similarity layer's dimension and zero-norm contracts at the
    * reader, like every batch cosine consumer. */
  def nearDupPairStream(vecs: DataFrame, cents: Seq[(Long, Seq[Double])],
      delayMs: Long = 10L * 60 * 1000): Dataset[NearDupPair] = {
    import graft.functions.DotProduct.dot_product
    import graft.operators.Similarity.{bandSigs, Dim, NearDupCos}
    val sigs = bandSigs(
      vecs.filter(size(col("embedding")) === Dim)
        .select(col("vec_id"), col("ts"),
          col("embedding").cast("array<double>").as("v"))
        .filter(dot_product(col("v"), col("v")) > 0.0)
        .withColumn("cluster",
          graft.functions.CentroidBest.centroid_negcos_best(cents, col("v"))
            .getField("c_id").cast("long")),
      Seq("vec_id", "ts", "v", "cluster"))
      .withWatermark("ts", s"$delayMs milliseconds")
      .as[VecArrival]
    sigs.groupByKey(r => (r.cluster, r.band_idx, r.band_val))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (_: (Long, Int, String), rows: Iterator[VecArrival],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // vec_id order makes the within-batch member build
            // deterministic under any partition scheduling.
            val arr = rows.toArray.sortBy(_.vec_id)
            var members = state.getOption.map(_.members).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
            var maxTs = Long.MinValue
            arr.foreach { r =>
              val rv = r.v.toArray
              members.foreach { m =>
                if (m.vec_id != r.vec_id &&
                    cosine(m.v.toArray, rv) >= NearDupCos) {
                  out += NearDupPair(math.min(m.vec_id, r.vec_id),
                    math.max(m.vec_id, r.vec_id))
                }
              }
              members = BucketMember(r.vec_id, r.v, r.ts.getTime) :: members
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
            }
            // Per-member GC: a member is only detectable while a
            // partner could still arrive inside its delay window;
            // past that, drop it so hot buckets stay bounded. >= not
            // >: a partner arriving EXACTLY delayMs after a member is
            // inside the documented closed-interval guarantee (the
            // CorpusStreams pair-GC boundary, fixed the same way).
            val wm = state.getCurrentWatermarkMs()
            members = members.filter(_.tsMs + delayMs >= wm)
            state.update(BucketState(members))
            state.setTimeoutTimestamp(math.max(maxTs + delayMs, wm + 1))
            out.iterator
          }
      }
  }

  implicit val hitEnc: Encoder[CrossModalHit] = Encoders.product[CrossModalHit]

  /** Streaming twin of the cross-modal retrieval capstone (q166): new
    * media documents arrive on a stream, encode through the SAME
    * deterministic media tower inside a mapPartitions pass (where a
    * real GPU encoder's model load amortizes per partition), and
    * retrieve their top-k embedding-table neighbors from the STATIC
    * corpus — the online tier of a retrieval service (index static,
    * queries streaming).
    *
    * Shape: the stream-static join is STATELESS (each probe's corpus
    * rows materialize entirely within its own micro-batch, because
    * the static side is complete), the cosine is the same native
    * codegen'd expression as the batch plan (bit-identical threshold
    * and ordering decisions), and the per-probe top-k is a bounded
    * k-element insertion inside one stateless flatMapGroupsWithState
    * pass — O(k) heap per group, never a per-probe sort of the
    * corpus. At 100 TB the static side would be the IVF/PQ index
    * (q30/q160) instead of the exact scan, same topology.
    *
    * Contract: each doc_id is ingested once (a re-sent probe re-emits
    * its top-k — idempotent for a set-consumer, exactly like the
    * batch query re-run). StreamingSpec pins stream ≡ batch q166 row
    * parity over a 2-batch replay. */
  def crossModalTopKStream(mediaDocs: DataFrame, corpus: DataFrame,
      k: Int = 5): Dataset[CrossModalHit] = {
    import graft.functions.CosineSimilarity.cosine_sim
    val session = mediaDocs.sparkSession
    import session.implicits._
    val probes = mediaDocs
      .select(col("doc_id"), col("text"))
      // null-text probes are dropped, not encoded as "" — the one
      // contract shared with batch q166 and its DuckDB oracle
      .filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition setup of a real cross-modal encoder goes HERE
        it.map { case (id, text) =>
          (id, graft.operators.Multimodal.mediaEmbed(text.getBytes("UTF-8")))
        }
      }
      .toDF("doc_id", "mv")
    val scored = probes
      .join(corpus.select(col("vec_id"), col("v")), expr("true"))
      .withColumn("cos", cosine_sim(col("mv"), col("v")))
      .select(col("doc_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[Int, CrossModalHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (docId: Long, rows: Iterator[(Long, Long, Double)],
         _: GroupState[Int]) =>
          // bounded (cos DESC, vec_id ASC) insertion — the batch
          // window's exact tie-break, O(k) state per group
          val top = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
          rows.foreach { case (_, vecId, cos) =>
            var i = 0
            while (i < top.length &&
                (top(i)._1 > cos || (top(i)._1 == cos && top(i)._2 < vecId)))
              i += 1
            if (i < k) {
              top.insert(i, (cos, vecId))
              if (top.length > k) top.remove(k)
            }
          }
          top.iterator.zipWithIndex.map { case ((cos, vecId), i) =>
            CrossModalHit(docId, (i + 1).toLong, vecId,
              math.floor(cos * 1000000.0 + 0.5) / 1000000.0)
          }
      }
  }

  /** Streaming twin of the incremental ANN maintenance monitor
    * (batch q168): vectors arriving after the index build are
    * assigned to the FROZEN trained cells and the live per-cell
    * arrival histogram is flagged against the training-time
    * histogram — the online tier of an index-maintenance service
    * (retrain trigger fires while recall is still healthy).
    *
    * Shape — every stage bounded and distributed:
    *  - assignment is the SAME narrow argmin expression as the batch
    *    plan ([[graft.operators.Similarity.assignL2]] over k·d
    *    centroid literals) — stateless, no join, no shuffle;
    *  - the running state is ONE row of k+1 fixed columns (per-cell
    *    conditional counts + the arrival total — the cell domain is
    *    k, known at plan time, the q142 domain-bounded-state
    *    argument), aggregated with map-side partials in complete
    *    mode: arriving rows combine inside their input partitions,
    *    never through a single stateful group;
    *  - a stateless projection fans the row back out to k
    *    [[CellDrift]] cells, computing the drift flag with the SAME
    *    exact integer cross-multiplication as batch q168 (training
    *    histogram and its total ride in as O(k) literals).
    *
    * Contract: each vec_id ingested once; re-running a batch re-emits
    * the (idempotent for a last-write-wins consumer) complete table.
    * StreamingSpec pins stream ≡ batch q168's (n_new, drifted)
    * columns over a 2-batch replay. */
  def annMaintenanceStream(newVecs: DataFrame,
      cents: Seq[(Long, Seq[Double])],
      baseHist: Seq[(Long, Long)]): Dataset[CellDrift] = {
    val session = newVecs.sparkSession
    import session.implicits._
    val tb = baseHist.map(_._2).sum
    val base = baseHist.toMap
    val assigned = graft.operators.Similarity.assignL2(newVecs, cents)
    val cellCols = cents.map { case (cId, _) =>
      sum(when(col("cluster") === cId, 1L).otherwise(0L)).as(s"c$cId")
    }
    val pivot = assigned.groupBy()
      .agg(count(lit(1)).as("tn"), cellCols: _*)
    pivot.select(explode(array(cents.map { case (cId, _) =>
        val nb = lit(base.getOrElse(cId, 0L))
        val nNew = col(s"c$cId")
        struct(lit(cId).as("cluster"), nb.as("n_base"), nNew.as("n_new"),
          when(nNew * lit(tb) > lit(2L) * nb * col("tn") ||
            lit(2L) * nNew * lit(tb) < nb * col("tn"), 1L).otherwise(0L)
            .as("drifted"))
      }: _*)).as("cell"))
      .select(col("cell.cluster"), col("cell.n_base"), col("cell.n_new"),
        col("cell.drifted"))
      .as[CellDrift]
  }
}
