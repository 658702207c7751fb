package graft.model

import java.sql.Timestamp

/** Data model per SURVEY.md §1 — case classes with the exact enum string
  * codecs of the reference (reference: include/etl_job_models.hpp:9-41,
  * include/job_monitoring_models.hpp:18-30, src/database_schema.cpp:29-64).
  */

object JobStatus {
  val Pending   = "PENDING"
  val Running   = "RUNNING"
  val Completed = "COMPLETED"
  val Failed    = "FAILED"
  val Cancelled = "CANCELLED"
  val All: Seq[String]      = Seq(Pending, Running, Completed, Failed, Cancelled)
  val Active: Seq[String]   = Seq(Pending, Running)
  val Terminal: Seq[String] = Seq(Completed, Failed, Cancelled)
  def isValid(s: String): Boolean = All.contains(s)
}

object JobType {
  val Extract   = "EXTRACT"
  val Transform = "TRANSFORM"
  val Load      = "LOAD"
  val FullEtl   = "FULL_ETL"
  val All: Seq[String] = Seq(Extract, Transform, Load, FullEtl)
  def isValid(s: String): Boolean = All.contains(s)
}

/** Log levels in severity order DEBUG<INFO<WARN<ERROR<FATAL
  * (reference: include/log_aggregator.hpp:124-139). */
object LogLevel {
  val Ordered: Seq[String] = Seq("DEBUG", "INFO", "WARN", "ERROR", "FATAL")
  val Ordinal: Map[String, Int] = Ordered.zipWithIndex.toMap
  def ordinalOf(level: String): Int = Ordinal.getOrElse(level, -1)
}

/** WebSocket event message types
  * (reference: include/job_monitoring_models.hpp:22-30). */
object MessageType {
  val JobStatusUpdate    = "JOB_STATUS_UPDATE"
  val JobProgressUpdate  = "JOB_PROGRESS_UPDATE"
  val JobLogMessage      = "JOB_LOG_MESSAGE"
  val JobMetricsUpdate   = "JOB_METRICS_UPDATE"
  val SystemNotification = "SYSTEM_NOTIFICATION"
  val ConnectionAck      = "CONNECTION_ACK"
  val ErrorMessage       = "ERROR_MESSAGE"
  val All: Seq[String] = Seq(JobStatusUpdate, JobProgressUpdate, JobLogMessage,
    JobMetricsUpdate, SystemNotification, ConnectionAck, ErrorMessage)
}

/** Per-job execution metrics
  * (reference: include/job_monitoring_models.hpp:33-84). */
final case class JobMetrics(
    recordsProcessed: Long = 0L,
    recordsSuccessful: Long = 0L,
    recordsFailed: Long = 0L,
    processingRate: Double = 0.0,
    averageProcessingRate: Double = 0.0,
    memoryUsage: Long = 0L,
    peakMemoryUsage: Long = 0L,
    cpuUsage: Double = 0.0,
    peakCpuUsage: Double = 0.0,
    executionTimeMs: Long = 0L,
    totalBytesProcessed: Long = 0L,
    totalBytesWritten: Long = 0L,
    totalBatches: Long = 0L,
    averageBatchSize: Double = 0.0,
    errorRate: Double = 0.0,
    throughputMBps: Double = 0.0,
    memoryEfficiency: Double = 0.0,
    cpuEfficiency: Double = 0.0)

/** Control-plane job row — the engine's unit of work
  * (reference: include/etl_job_models.hpp:9-41, src/database_schema.cpp:29-64). */
final case class EtlJob(
    jobId: String,
    jobType: String,
    status: String,
    sourceConfig: String,
    targetConfig: String,
    createdAt: Timestamp,
    startedAt: Option[Timestamp] = None,
    completedAt: Option[Timestamp] = None,
    errorMessage: Option[String] = None,
    recordsProcessed: Long = 0L,
    recordsSuccessful: Long = 0L,
    recordsFailed: Long = 0L,
    processingRate: Double = 0.0,
    averageProcessingRate: Double = 0.0,
    peakMemoryUsage: Long = 0L,
    peakCpuUsage: Double = 0.0,
    executionTimeMs: Long = 0L,
    totalBytesProcessed: Long = 0L,
    totalBytesWritten: Long = 0L,
    totalBatches: Long = 0L,
    averageBatchSize: Double = 0.0,
    errorRate: Double = 0.0,
    throughputMBps: Double = 0.0,
    memoryEfficiency: Double = 0.0,
    cpuEfficiency: Double = 0.0,
    startTime: Option[Timestamp] = None,
    lastUpdateTime: Option[Timestamp] = None)

/** Live log event (reference: include/job_monitoring_models.hpp:133-150). */
final case class LogMessage(
    jobId: String,
    level: String,
    component: String,
    message: String,
    timestamp: Timestamp,
    context: Map[String, String] = Map.empty)

/** Historical (file-parsed) log row
  * (reference: include/log_file_manager.hpp:26-43). */
final case class HistoricalLogEntry(
    timestamp: Timestamp,
    level: String,
    component: String,
    jobId: String,
    threadId: String,
    message: String,
    filename: String,
    lineNumber: Long)

/** Event-stream message (reference: include/job_monitoring_models.hpp:153-171). */
final case class WebSocketMessage(
    msgType: String,
    timestamp: Timestamp,
    data: String,
    targetJobId: Option[String] = None,
    targetLevel: Option[String] = None)

/** Per-subscriber routing filters; empty list = wildcard
  * (reference: include/job_monitoring_models.hpp:174-209,
  * src/job_monitoring_models.cpp:817-859). */
final case class ConnectionFilters(
    connectionId: String,
    jobIds: Seq[String] = Seq.empty,
    logLevels: Seq[String] = Seq.empty,
    messageTypes: Seq[String] = Seq.empty,
    includeSystemNotifications: Boolean = true)

/** Monitoring snapshot kept per job by the stateful registry
  * (reference: include/job_monitoring_models.hpp:107-130). */
final case class JobMonitoringData(
    jobId: String,
    status: String,
    progressPercent: Int,
    currentStep: String,
    executionTimeMs: Long,
    recentLogs: Seq[String] = Seq.empty)

/** Ordered row-transformation rule
  * (reference: include/data_transformer.hpp:9-16). */
final case class TransformationRule(
    sourceField: String,
    targetField: String,
    transformationType: String,
    parameters: Map[String, String] = Map.empty)

/** Resource utilization snapshot
  * (reference: include/job_monitor_service.hpp:122-128). */
final case class ResourceUtilization(
    avgMemoryMb: Double,
    peakMemoryMb: Double,
    avgCpu: Double,
    peakCpu: Double,
    timestamp: Timestamp)
