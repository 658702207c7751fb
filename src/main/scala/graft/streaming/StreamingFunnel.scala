package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of [[graft.operators.Funnel]]: a per-user state
  * machine over micro-batches that emits a progress row each time a user
  * advances one funnel step. State is `numSteps` epoch-millis per user —
  * O(1), RocksDB-ready, independent of event volume.
  *
  * Contract vs the batch operator: identical results when each user's
  * events arrive in event-time order (within a batch the group is sorted
  * by ts, so intra-batch disorder is absorbed). A cross-batch straggler
  * that would have produced an EARLIER step time does not rewrite
  * already-emitted progress — the same no-retraction stance as the
  * first-seen dedup and the job registry, and the only stance Append
  * mode can honor. Ordering is strict (`ts > previous step's ts`),
  * matching the batch operator exactly.
  */
object StreamingFunnel {

  /** One event already resolved to its funnel step (1-based; resolve
    * predicates upstream with a when/otherwise projection). */
  case class FunnelEvent(userId: Long, step: Int, ts: Timestamp)

  /** Epoch-millis of each completed step, in step order. */
  case class FunnelState(stepTsMillis: Seq[Long])

  /** Emitted when `userId` completes `step` at `ts`. */
  case class FunnelProgress(userId: Long, step: Int, ts: Timestamp)

  /** The live conversion curve: users-per-step over [[advance]]'s
    * progress stream (update- or complete-mode sink). Each progress row is one
    * (user, step) advance, emitted exactly once, so a running count per
    * step IS the curve — state is `numSteps` counters, nothing per
    * user. */
  def curve(progress: Dataset[FunnelProgress]): org.apache.spark.sql.DataFrame =
    progress.groupBy(org.apache.spark.sql.functions.col("step"))
      .count().withColumnRenamed("count", "n_users")

  /** Advance per-user funnel state over micro-batches.
    *
    * State lifetime: with `ttlMillis = None` state lives forever (the
    * RateLimiter/JobRegistry stance — fine for bounded key universes,
    * unbounded growth otherwise). Funnels have a natural horizon — the
    * conversion window — so pass `ttlMillis = Some(windowMillis)` to
    * bound each attempt to `anchor + ttlMillis`, where the anchor is the
    * user's step-1 time (an abandoned funnel) or, for users yet to
    * complete step 1, their latest seen event time. The window is
    * enforced TWICE: state expires via EventTimeTimeout once the
    * watermark passes the bound (bounding memory), and — because that
    * timeout only fires on a trigger with no data for the key — every
    * incoming event is also gated against the bound directly, so a
    * step-k event event-timed after the window lapsed ends the attempt
    * instead of converting it (same inclusive `ts - step1_ts <= window`
    * rule as the batch operator's `windowMillis`). Requires
    * `events.withWatermark("ts", ...)` upstream (EventTimeTimeout
    * contract). After expiry the funnel is
    * RESTARTABLE: a fresh step-1 event begins a new attempt and emits a
    * new progress row — [[curve]] then counts attempts, not distinct
    * users, which is the honest reading once state is bounded.
    *
    * Cross-batch disorder contract (pinned by spec): a step-k event
    * delivered in an EARLIER micro-batch than its step-(k-1) predecessor
    * is NOT buffered — the user advances only if a later step-k event
    * arrives. Streaming progress is therefore a lower bound on the batch
    * funnel over the same events; within one batch, ts-sorting absorbs
    * disorder exactly like the batch operator. */
  def advance(events: Dataset[FunnelEvent], numSteps: Int,
      ttlMillis: Option[Long] = None): Dataset[FunnelProgress] = {
    require(numSteps > 0)
    require(ttlMillis.forall(_ > 0), "ttlMillis must be positive")
    implicit val evEnc = Encoders.product[FunnelEvent]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelProgress]
    val timeoutConf =
      if (ttlMillis.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // conversion window lapsed with no further progress: drop the
            // abandoned funnel (state is what's bounded; emitted progress
            // rows stand — the no-retraction stance)
            state.remove()
            Iterator.empty
          } else {
            var done = state.getOption.map(_.stepTsMillis).getOrElse(Seq.empty)
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelProgress]
            var latestSeen = 0L
            // sort the batch's group by event time so intra-batch disorder
            // cannot skip a step that arrived "late" within the same batch
            evs.toSeq.sortBy(e => (e.ts.getTime, e.step)).foreach { e =>
              if (e.ts.getTime > latestSeen) latestSeen = e.ts.getTime
              // window enforcement IN the event path, not just at timeout:
              // EventTimeTimeout only fires on a trigger with no data for
              // the key, so a step-k event landing after the window lapsed
              // (but before the timeout fired) must not convert the
              // abandoned attempt. Same inclusive bound as the batch
              // operator's windowMillis (ts - step1_ts <= ttl counts).
              // The lapsed attempt ends here; the event itself is then
              // processed normally, so a fresh step-1 event restarts.
              ttlMillis.foreach { ttl =>
                if (done.nonEmpty && e.ts.getTime > done.head + ttl)
                  done = Seq.empty
              }
              val next = done.length + 1
              if (next <= numSteps && e.step == next &&
                  (done.isEmpty || e.ts.getTime > done.last)) {
                done = done :+ e.ts.getTime
                out += FunnelProgress(uid, e.step, e.ts)
              }
            }
            state.update(FunnelState(done))
            ttlMillis.foreach { ttl =>
              val anchor = done.headOption.getOrElse(latestSeen)
              // setTimeoutTimestamp rejects values at or below the current
              // watermark; clamp so an already-lapsed anchor expires at the
              // next batch rather than failing the query
              state.setTimeoutTimestamp(
                math.max(anchor + ttl, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }
}
