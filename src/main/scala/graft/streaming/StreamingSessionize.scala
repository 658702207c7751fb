package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of [[graft.operators.Sessionize.byGap]]: gap-based
  * sessionization as a per-key state machine that emits each session ONCE,
  * as a closed summary, when the event-time watermark passes the session's
  * last event + gap — the Append-mode-legal shape (per-event session
  * labels can't be appended before the session's membership is final;
  * the summary can).
  *
  * State is (start, last, count) per key — O(1), RocksDB-ready,
  * independent of session length. EventTimeTimeout closes idle sessions,
  * and the event path ALSO closes on gap (an event `> gap` after the
  * last one closes the old session and opens its own — no reliance on a
  * quiet trigger, the same double-enforcement stance as
  * [[StreamingFunnel.advance]]'s conversion window).
  *
  * Contract vs the batch operator (pinned by spec): when each key's
  * events arrive in event-time order across batches (intra-batch
  * disorder is absorbed by sorting the group), the closed-session
  * summaries equal batch [[graft.operators.Sessionize.byGap]] grouped to
  * (key, session start, session end, n). A cross-batch straggler that
  * event-times into an already-closed session starts a NEW session
  * instead (no retraction — the only stance Append can honor; streaming
  * session count is therefore an upper bound on batch).
  */
object StreamingSessionize {

  case class SessionEvent(userId: Long, ts: Timestamp)

  case class SessionState(startMillis: Long, lastMillis: Long, n: Long)

  /** One closed session. `startTs` doubles as the session id within a
    * key: it is the first event's time, unique per (key, session). */
  case class ClosedSession(userId: Long, startTs: Timestamp, endTs: Timestamp,
      nEvents: Long)

  /** Requires `events.withWatermark("ts", ...)` upstream
    * (EventTimeTimeout contract). `gapMillis` uses the same strict-`>`
    * boundary as the batch operator: an event exactly `gap` after the
    * previous one continues the session. */
  def sessions(events: Dataset[SessionEvent],
      gapMillis: Long): Dataset[ClosedSession] = {
    require(gapMillis > 0, "gapMillis must be positive")
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          def closed(s: SessionState) = ClosedSession(uid,
            new Timestamp(s.startMillis), new Timestamp(s.lastMillis), s.n)
          if (state.hasTimedOut) {
            val out = state.getOption.map(closed).iterator
            state.remove()
            out.toSeq.iterator
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMillis > gapMillis =>
                  // gap exceeded inside the event path: close the old
                  // session now (the timeout may never fire if this key
                  // keeps receiving data every trigger)
                  out += closed(s)
                  cur = Some(SessionState(t, t, 1L))
                case Some(s) =>
                  // extend; a sorted batch means t >= s.lastMillis except
                  // for cross-batch stragglers, which fold in without
                  // moving the end backwards
                  cur = Some(SessionState(s.startMillis,
                    math.max(s.lastMillis, t), s.n + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close once the watermark passes last + gap; clamp above
              // the current watermark (setTimeoutTimestamp rejects values
              // at or below it)
              state.setTimeoutTimestamp(
                math.max(s.lastMillis + gapMillis, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }
}
