package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event record for stateful streaming ops (ts as a real
  * timestamp — streaming sources deliver decoded records). */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Running per-user totals (mapGroupsWithState output + state). */
case class UserTotal(user_id: Long, n_events: Long, sum_value: Double)

/** State for gap-sessionization: the user's currently-open session. */
case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)

/** A closed session emitted by [[StatefulOps.sessionsCustom]]. */
case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
    n_events: Long, sum_value: Double)

/** Custom stateful streaming operators via KeyValueGroupedDataset
  * state APIs — the arbitrary-state tier beyond watermark + windowed
  * aggregation (EventStreams): blow's conceptually-unbounded pipelines
  * (`/root/reference/maps/maps.go:44-47`) carry no state at all, so
  * this is pure growth surface, but it is the piece a real event
  * pipeline needs when sessions/counters don't fit a built-in window.
  *
  * 100 TB/day notes: state lives in the state store, hash-partitioned
  * by group key — the same shuffle shape as a batch groupBy; per-key
  * state must stay O(1) (these keep a fixed-size struct per user).
  */
object StatefulOps {

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val totalEnc: Encoder[UserTotal] = Encoders.product[UserTotal]
  implicit val openEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
  implicit val sessEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Running per-user event count + value sum, updated every
    * micro-batch (`mapGroupsWithState`; write with update mode).
    * State per key is one fixed-size struct — O(users) total. */
  def userTotals(events: Dataset[Ev]): Dataset[UserTotal] =
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserTotal]) =>
          var n = 0L
          var s = 0.0
          state.getOption.foreach { t => n = t.n_events; s = t.sum_value }
          evs.foreach { e => n += 1; s += e.value }
          val out = UserTotal(uid, n, s)
          state.update(out)
          out
      }

  /** Gap-based sessionization with custom state
    * (`flatMapGroupsWithState`): the streaming twin of the batch q18
    * lag/running-sum formulation, keeping one open session per user
    * and emitting a session as soon as a gap closes it. The final
    * open session per user stays in state (a production job would add
    * an event-time timeout to flush it; kept timeout-free here so
    * semantics are exactly replayable in tests). Events inside a
    * micro-batch are sorted per group — state size stays one struct
    * per user regardless of batch size. */
  def sessionsCustom(events: Dataset[Ev],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] =
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) =>
          val sorted = evs.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var open = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            open = open match {
              case Some(o) if t - o.lastMs <= gapMs =>
                Some(o.copy(lastMs = t, n = o.n + 1, sum = o.sum + e.value))
              case Some(o) =>
                closed += SessionOut(uid, o.startMs, o.lastMs, o.n, o.sum)
                Some(OpenSession(t, t, 1, e.value))
              case None =>
                Some(OpenSession(t, t, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
}
