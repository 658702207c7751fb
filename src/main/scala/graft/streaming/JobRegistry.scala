package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.JobMonitoringData

/** ST5+ST6: the stateful job registry — the reference's
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

  /** Per-key transition function. Emits the updated monitoring row for
    * every event that is NOT suppressed; progress events within the
    * threshold of the last published progress emit nothing
    * (reference: src/job_monitor_service.cpp:922-933 — first update
    * always passes). */
  def transition(jobId: String, events: Iterator[JobEvent],
      state: GroupState[JobMonitoringData]): Iterator[JobMonitoringData] = {
    var cur = state.getOption.getOrElse(
      JobMonitoringData(jobId, "PENDING", 0, "", 0L, Seq.empty))
    val isFirst = state.getOption.isEmpty
    var first = isFirst
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
          if (first || math.abs(p - cur.progressPercent) >= ProgressUpdateThreshold) {
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
  def registry(events: Dataset[JobEvent]): Dataset[JobMonitoringData] = {
    implicit val stateEnc = Encoders.product[JobMonitoringData]
    implicit val eventEnc = Encoders.product[JobEvent]
    events.groupByKey(_.jobId)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(transition)
  }
}
