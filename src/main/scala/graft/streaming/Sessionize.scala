package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` form of the batch `window_session` query
  * (SURVEY §2.5/§2.7): per user, events closer than `gapSec` chain into one
  * session; a longer silence closes it.
  *
  * State machine per key: a SHORT ascending list of disjoint pending
  * sessions (not just the newest one). Each arriving event merges into
  * every pending session whose gap-reach contains it — at most two, in
  * which case it BRIDGES them into one — or starts a new session in place.
  * That merge is ORDER-INSENSITIVE: the final partition of events into
  * sessions is the connected components of the "within `gapSec` in sorted
  * order" relation, i.e. exactly the sorted-batch answer, no matter how
  * arrivals are ordered or cut into micro-batches.
  *
  * A session is emitted (appended) only once it is SEALED — the watermark
  * has passed `lastSec + gapSec`, so no admissible event can extend or
  * bridge it — or when it overflows the bounded pending list (oldest
  * first; `maxPending` ≥ (watermark delay / gap) + 1 makes overflow
  * unreachable). Emission is therefore later than a naive
  * close-on-next-event rule, but it is exactly once and exactly the batch
  * answer for every event the watermark admits; the only residual
  * divergences are watermark-DROPPED events and cap overflow — both the
  * bounded-state price any streaming engine pays. An event-time timeout at
  * the oldest pending deadline emits sealed sessions for keys that go
  * quiet. On a bounded (batch) frame all sessions are final, so everything
  * but the still-open newest emits immediately — byte-identical to the
  * sorted-batch `window_session` semantics and its oracle.
  *
  * Gap semantics match the batch query exactly: comparison on epoch
  * SECONDS, strict `> gapSec` closes (a gap of exactly `gapSec` chains).
  */
object Sessionize extends Serializable {

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class OpenSession(startSec: Long, lastSec: Long, n: Long)

  /** Pending sessions, ascending in time, pairwise > gapSec apart. */
  final case class SessState(sessions: Seq[OpenSession])

  final case class UserSession(user_id: Long, session_start: Long,
                               session_end: Long, n_events: Long)

  private def close(user: Long, s: OpenSession): UserSession =
    UserSession(user, s.startSec, s.lastSec, s.n)

  /** Merge a batch of event seconds (ANY order) into the ascending
    * disjoint pending list: a gap-tolerant interval sweep. Events and
    * pending sessions are walked together in `startSec` order; an item
    * within `gapSec` of the previously emitted span coalesces into it
    * (this is how one event BRIDGES two pending sessions: it closes the
    * gap to the lower one, and the upper one then coalesces too).
    * O(n log n + s) for n new events over s pending sessions — linear
    * after the sort, independent of how many sessions a key has.
    *
    * Order-insensitive: the output partition is the connected components
    * of the "within `gapSec` of the next event in sorted order" relation
    * over ALL events seen so far — exactly the sorted-batch answer,
    * however arrivals were ordered or cut into batches (gap-closure of a
    * pre-closed interval set plus new points equals closure of the whole
    * set). */
  def merge(gapSec: Long, pending: Seq[OpenSession], secs: Seq[Long]): Seq[OpenSession] = {
    val events = secs.sorted
    val p = pending.toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    def push(s: OpenSession): Unit =
      if (out.nonEmpty && s.startSec - out.last.lastSec <= gapSec) {
        val t = out.last
        out(out.size - 1) = OpenSession(math.min(t.startSec, s.startSec),
          math.max(t.lastSec, s.lastSec), t.n + s.n)
      } else out += s
    var i = 0
    var j = 0
    while (i < p.size || j < events.size) {
      if (j >= events.size || (i < p.size && p(i).startSec <= events(j))) {
        push(p(i)); i += 1
      } else {
        push(OpenSession(events(j), events(j), 1)); j += 1
      }
    }
    out.toSeq
  }

  /** Split pending into (emit, retain). SEALED sessions — every admissible
    * event (ts ≥ watermark) lies beyond their reach — emit oldest-first;
    * past those, overflow beyond `maxPending` also emits oldest-first
    * (bounded state; a cap ≥ watermarkDelay/gap + 1 never overflows). */
  def emitReady(gapSec: Long, pending: Seq[OpenSession], watermarkMs: Long,
                maxPending: Int): (Seq[OpenSession], Seq[OpenSession]) = {
    val sealedN = pending.segmentLength(s => (s.lastSec + gapSec + 1) * 1000 <= watermarkMs)
    val rest = pending.drop(sealedN)
    val overflow = math.max(0, rest.size - maxPending)
    (pending.take(sealedN) ++ rest.take(overflow), rest.drop(overflow))
  }

  /** events (post-[[CdcPipeline.transform]] shape: `user_id`, `ts`) →
    * appended sealed sessions. Works on a stream (watermark + event-time
    * timeout) and on a bounded frame (batch flush: all but the open
    * newest). */
  def sessions(events: DataFrame, gapSec: Long = 1800L,
               watermarkDelay: String = "1 hour",
               maxPending: Int = 4): Dataset[UserSession] = {
    implicit val eventEnc: Encoder[SessionEvent] = Encoders.product[SessionEvent]
    implicit val stateEnc: Encoder[SessState] = Encoders.product[SessState]
    implicit val outEnc: Encoder[UserSession] = Encoders.product[UserSession]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val streaming = events.isStreaming // capture the Boolean, not the frame

    def fn(user: Long, rows: Iterator[SessionEvent], state: GroupState[SessState])
    : Iterator[UserSession] = {
      val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      // on a timeout wake-up `rows` is empty, so this is just `prior`
      val pending = merge(gapSec, prior, rows.map(_.ts.getTime / 1000).toSeq)
      if (streaming) {
        val wm = state.getCurrentWatermarkMs
        val (emit, retain) = emitReady(gapSec, pending, wm, maxPending)
        if (retain.isEmpty) { if (state.exists || state.hasTimedOut) state.remove() }
        else {
          state.update(SessState(retain))
          // wake when the oldest pending seals (clamped above the current
          // watermark — Spark rejects timestamps at or below it)
          val deadline = (retain.head.lastSec + gapSec + 1) * 1000
          state.setTimeoutTimestamp(math.max(deadline, wm + 1))
        }
        emit.iterator.map(close(user, _))
      } else {
        // bounded input is the complete log: everything but the open
        // newest session is final
        pending.dropRight(1).iterator.map(close(user, _))
      }
    }

    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn _)
  }
}
