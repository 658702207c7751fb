package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.JobMonitoringData

/** ST5+ST6+ST7: the stateful job registry — the reference's
  * activeJobs_/completedJobs_ maps + progress suppression + recent-log
  * ring buffer, re-expressed as the canonical Spark arbitrary-stateful
  * operator `flatMapGroupsWithState` keyed by jobId
  * (reference: include/job_monitor_service.hpp:146-168,
  * src/job_monitor_service.cpp:175-207, 922-933).
  *
  * Scale: state is partitioned by jobId across executors; each micro-batch
  * shuffles only the new events (not the state), and the emitted rows are
  * only the non-suppressed updates — the 5%-threshold suppression happens
  * before any downstream fan-out, exactly like the reference.
  *
  * Retention (ST7): the reference moves terminal jobs to completedJobs_
  * and prunes them after MONITORING_DATA_RETENTION (24 h,
  * include/job_monitor_service.hpp:159). [[registryExpiring]] replicates
  * that with an event-time state timeout: once a job reaches a terminal
  * status, its state expires `retention` after its last event — without
  * it, state grows unboundedly with the number of jobs ever seen.
  */
object JobRegistry {

  /** One event on the job event bus (union of the reference's status/
    * progress/log callbacks, src/etl_job_manager.cpp:202-226). */
  final case class JobEvent(
      jobId: String,
      eventType: String, // STATUS | PROGRESS | LOG
      status: Option[String],
      progress: Option[Int],
      currentStep: Option[String],
      logLine: Option[String],
      ts: Timestamp)

  val ProgressUpdateThreshold = 5 // reference: include/job_monitor_service.hpp:167
  val RecentLogsCapacity = 50     // reference: include/job_monitor_service.hpp:166
  val RetentionMillis = 24L * 3600 * 1000 // reference: include/job_monitor_service.hpp:159

  private val TerminalStatuses = Set("COMPLETED", "FAILED", "CANCELLED")

  /** Per-key transition function. Emits the updated monitoring row for
    * every event that is NOT suppressed; progress events within
    * `threshold` of the last published progress emit nothing
    * (reference: src/job_monitor_service.cpp:922-933 — first update
    * always passes). Threshold 0 disables suppression (every event
    * emits), which makes the output SQL-expressible for the oracle. */
  def transition(threshold: Int)(jobId: String, events: Iterator[JobEvent],
      state: GroupState[JobMonitoringData]): Iterator[JobMonitoringData] = {
    var cur = state.getOption.getOrElse(
      JobMonitoringData(jobId, "PENDING", 0, "", 0L, Seq.empty))
    var first = state.getOption.isEmpty
    val out = scala.collection.mutable.ArrayBuffer.empty[JobMonitoringData]
    // events within a micro-batch apply in event-time order: the bus is
    // processing-time ordered in the reference (SURVEY §2.9 ST8)
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      e.eventType match {
        case "STATUS" =>
          cur = cur.copy(status = e.status.getOrElse(cur.status),
            currentStep = e.currentStep.getOrElse(cur.currentStep))
          out += cur
        case "PROGRESS" =>
          val p = e.progress.getOrElse(cur.progressPercent)
          if (first || math.abs(p - cur.progressPercent) >= threshold) {
            cur = cur.copy(progressPercent = p,
              currentStep = e.currentStep.getOrElse(cur.currentStep))
            out += cur
          } // else suppressed: state unchanged, nothing emitted
        case "LOG" =>
          val logs = (cur.recentLogs ++ e.logLine.toSeq).takeRight(RecentLogsCapacity)
          cur = cur.copy(recentLogs = logs)
          out += cur
        case _ => // unknown event type ignored
      }
      first = false
    }
    state.update(cur)
    out.iterator
  }

  /** Wire the registry over a (possibly streaming) event dataset. */
  def registry(events: Dataset[JobEvent],
      threshold: Int = ProgressUpdateThreshold): Dataset[JobMonitoringData] = {
    implicit val stateEnc = Encoders.product[JobMonitoringData]
    implicit val eventEnc = Encoders.product[JobEvent]
    events.groupByKey(_.jobId)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        transition(threshold))
  }

  /** Streaming registry with terminal-job retention: the caller's event
    * dataset must carry a watermark on `ts`; once a job's status is
    * terminal its state expires `retentionMillis` after its last event
    * time, so completed jobs do not accumulate in the state store
    * forever. Uses event-time timeouts (deterministic under replay —
    * the Spark-idiomatic form of the reference's 24 h cleanup thread). */
  def registryExpiring(events: Dataset[JobEvent],
      threshold: Int = ProgressUpdateThreshold,
      retentionMillis: Long = RetentionMillis): Dataset[JobMonitoringData] = {
    implicit val stateEnc = Encoders.product[JobMonitoringData]
    implicit val eventEnc = Encoders.product[JobEvent]
    events.groupByKey(_.jobId)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (jobId: String, evs: Iterator[JobEvent], state: GroupState[JobMonitoringData]) =>
          if (state.hasTimedOut) {
            state.remove() // retention elapsed → drop the terminal job
            Iterator.empty
          } else {
            val evSeq = evs.toSeq
            val out = transition(threshold)(jobId, evSeq.iterator, state)
            if (state.exists && TerminalStatuses.contains(state.get.status)) {
              val lastTs = evSeq.map(_.ts.getTime).max
              // must be strictly later than the current watermark
              state.setTimeoutTimestamp(
                math.max(lastTs + retentionMillis, state.getCurrentWatermarkMs() + 1))
            }
            out
          }
      }
  }
}
