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

  def advance(events: Dataset[FunnelEvent], numSteps: Int)
      : Dataset[FunnelProgress] = {
    require(numSteps > 0)
    implicit val evEnc = Encoders.product[FunnelEvent]
    implicit val stEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelProgress]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var done = state.getOption.map(_.stepTsMillis).getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelProgress]
          // sort the batch's group by event time so intra-batch disorder
          // cannot skip a step that arrived "late" within the same batch
          evs.toSeq.sortBy(e => (e.ts.getTime, e.step)).foreach { e =>
            val next = done.length + 1
            if (next <= numSteps && e.step == next &&
                (done.isEmpty || e.ts.getTime > done.last)) {
              done = done :+ e.ts.getTime
              out += FunnelProgress(uid, e.step, e.ts)
            }
          }
          state.update(FunnelState(done))
          out.iterator
      }
  }
}
