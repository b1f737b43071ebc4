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
  * State machine per key: the single open session (start, last, count).
  * Arriving events (sorted by event time inside the batch) extend or close
  * it; closed sessions emit immediately, the open tail lives in the state
  * store (checkpointed — it survives restarts, so a session spanning two
  * micro-batches or a crash/restart still comes out as ONE session). An
  * event-time timeout at `last + gap` emits the open session once the
  * watermark passes it — bounded state, like the built-in windowed aggs.
  *
  * Gap semantics match the batch query exactly: comparison on epoch
  * SECONDS, strict `> gapSec` closes (a gap of exactly `gapSec` chains).
  */
object Sessionize extends Serializable {

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class OpenSession(startSec: Long, lastSec: Long, n: Long)
  final case class UserSession(user_id: Long, session_start: Long,
                               session_end: Long, n_events: Long)

  private def close(user: Long, s: OpenSession): UserSession =
    UserSession(user, s.startSec, s.lastSec, s.n)

  /** The per-key state transition, factored out for direct unit testing.
    *
    * Out-of-order arrivals (a later micro-batch delivering events older
    * than the open session — admitted whenever the watermark delay exceeds
    * the gap) are handled explicitly:
    *  - an event within `gapSec` of the open session's SPAN (i.e.
    *    `sec ≥ startSec − gapSec`) merges into it, lowering `startSec` when
    *    the event precedes the current start — exactly what the batch
    *    answer over the fully-sorted log produces;
    *  - events older than the open session can reach
    *    (`sec < startSec − gapSec`) belong to an earlier period. Within the
    *    batch they chain WITH EACH OTHER under the normal gap rule (batch
    *    input is sorted, so they all precede the in-reach events) — a
    *    delayed partition replaying an old burst yields that burst's
    *    session, not n singletons. The first in-reach event then settles
    *    the chain: when it lies within `gapSec` of the chain's tail it
    *    BRIDGES — the sorted batch log chains straggler → event → session
    *    into one session, so the chain folds into the merged state (its
    *    start becomes the session start) rather than emitting; only a
    *    chain more than `gapSec` below the bridging event emits closed.
    *    Append mode cannot retract an already-emitted session, so chains
    *    that closed in an EARLIER batch remain the one residual,
    *    documented batch/stream divergence. */
  def advance(user: Long, gapSec: Long, sortedSec: Seq[Long], prior: Option[OpenSession])
  : (Seq[UserSession], Option[OpenSession]) = {
    val out = Seq.newBuilder[UserSession]
    var cur = prior
    var late: Option[OpenSession] = None // straggler chain below cur's reach
    def closeLate(): Unit = { late.foreach(l => out += close(user, l)); late = None }
    sortedSec.foreach { sec =>
      cur match {
        case Some(s) if sec < s.startSec - gapSec =>
          late = late match {
            case Some(l) if sec - l.lastSec <= gapSec =>
              Some(OpenSession(l.startSec, math.max(l.lastSec, sec), l.n + 1))
            case other => other.foreach(l => out += close(user, l)); Some(OpenSession(sec, sec, 1))
          }
        case _ =>
          cur = cur match {
            case Some(s) if sec - s.lastSec <= gapSec =>
              // sec merges into the open session. If it also bridges the
              // straggler chain (within gapSec of its tail), the batch log
              // chains straight through it — fold the chain in; else close.
              val bridge = late.filter(l => sec - l.lastSec <= gapSec)
              if (bridge.isEmpty) closeLate() else late = None
              val start = math.min(bridge.map(_.startSec).getOrElse(sec), math.min(s.startSec, sec))
              Some(OpenSession(start, math.max(s.lastSec, sec), s.n + 1 + bridge.map(_.n).getOrElse(0L)))
            case Some(s) =>
              // sec > lastSec + gapSec: a chain (tail < startSec − gapSec)
              // sits > 2·gapSec below sec, so it can never bridge here.
              closeLate()
              out += close(user, s)
              Some(OpenSession(sec, sec, 1))
            case None => Some(OpenSession(sec, sec, 1)) // no prior ⇒ no chain
          }
      }
    }
    closeLate()
    (out.result(), cur)
  }

  /** events (post-[[CdcPipeline.transform]] shape: `user_id`, `ts`) →
    * appended closed sessions. Works on a stream (watermark + event-time
    * timeout) and unchanged on a bounded frame. */
  def sessions(events: DataFrame, gapSec: Long = 1800L,
               watermarkDelay: String = "1 hour"): Dataset[UserSession] = {
    implicit val eventEnc: Encoder[SessionEvent] = Encoders.product[SessionEvent]
    implicit val stateEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
    implicit val outEnc: Encoder[UserSession] = Encoders.product[UserSession]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val streaming = events.isStreaming // capture the Boolean, not the frame

    def fn(user: Long, rows: Iterator[SessionEvent], state: GroupState[OpenSession])
    : Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val done = close(user, state.get)
        state.remove()
        Iterator.single(done)
      } else {
        val sorted = rows.map(_.ts.getTime / 1000).toArray.sorted
        val (closed, open) = advance(user, gapSec, sorted.toIndexedSeq, state.getOption)
        open.foreach { s =>
          state.update(s)
          if (streaming)
            state.setTimeoutTimestamp((s.lastSec + gapSec) * 1000 + 1)
        }
        closed.iterator
      }
    }

    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn _)
  }
}
