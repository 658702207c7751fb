package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.operators.{JobQueries, LogQuery, MetricsAggregations}

/** Reference-shaped fixture tests (FIXTURES.md §1/§3) for the operator
  * APIs not fully coverable by the DuckDB oracle (JSON row shape,
  * validation errors, empty-input defaults). */
class OperatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("operator-spec", "4").getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  private def jobsFixture: DataFrame = {
    import spark.implicits._
    Seq(
      EtlJob("job_1001", "FULL_ETL", "COMPLETED", "src_a", "tgt_a",
        ts("2025-09-01 10:00:00"), Some(ts("2025-09-01 10:00:05")),
        Some(ts("2025-09-01 10:05:05")), None,
        recordsProcessed = 100, recordsSuccessful = 95, recordsFailed = 5),
      EtlJob("job_1002", "EXTRACT", "RUNNING", "src_b", "tgt_b",
        ts("2025-09-01 11:00:00"), Some(ts("2025-09-01 11:00:02")), None, None,
        recordsProcessed = 40),
      EtlJob("job_1003", "TRANSFORM", "FAILED", "src_c", "tgt_c",
        ts("2025-09-01 12:00:00"), Some(ts("2025-09-01 12:00:01")),
        Some(ts("2025-09-01 12:00:09")), Some("Simulated constraint violation"),
        recordsProcessed = 20, recordsFailed = 20),
      EtlJob("job_1004", "LOAD", "PENDING", "src_d", "tgt_d",
        ts("2025-09-01 13:00:00"))).toDF()
  }

  test("param validation rejects bad enums and limits") {
    assert(JobQueries.validate(JobQueries.JobListParams(status = Some("NOPE"))).isLeft)
    assert(JobQueries.validate(JobQueries.JobListParams(limit = 0)).isLeft)
    assert(JobQueries.validate(JobQueries.JobListParams(limit = 1001)).isLeft)
    assert(JobQueries.validate(JobQueries.JobListParams(
      from = Some(ts("2025-09-02 00:00:00")), to = Some(ts("2025-09-01 00:00:00")))).isLeft)
    assert(JobQueries.validate(JobQueries.JobListParams(status = Some("RUNNING"))).isRight)
  }

  test("monitor jobs JSON row matches the reference shape") {
    import org.apache.spark.sql.functions.lit
    val now = lit("2025-09-01 11:30:02").cast("timestamp")
    val rows = JobQueries.monitorJobsJson(jobsFixture,
      JobQueries.JobListParams(status = Some("RUNNING")), now)
      .collect().map(_.getString(0))
    assert(rows.length == 1)
    val j = rows.head
    // RUNNING job: executionTime = now - startedAt = 30 min in ms
    assert(j.contains(""""jobId":"job_1002""""))
    assert(j.contains(""""type":"EXTRACT""""))
    assert(j.contains(""""executionTimeMs":1800000"""))
    assert(!j.contains("errorMessage")) // omitted when empty (to_json drops null)
  }

  test("statusCounts pivots to one row") {
    val r = MetricsAggregations.statusCounts(jobsFixture).head
    assert(r.getLong(0) == 4 && r.getLong(1) == 1 && r.getLong(2) == 1 && r.getLong(3) == 1)
  }

  test("aggregateMetrics on empty input returns zero-ish defaults") {
    import spark.implicits._
    val empty = Seq.empty[JobMetrics].toDF()
      .withColumn("jobId", org.apache.spark.sql.functions.lit("x"))
    val r = MetricsAggregations.aggregateMetrics(empty)
    // sums over empty → nulls; derived guards keep ratios at 0.0
    val row = r.select("averageProcessingRate", "errorRate", "processingRate").head
    assert(row.getDouble(0) == 0.0 && row.getDouble(1) == 0.0 && row.getDouble(2) == 0.0)
  }

  test("log query level range and sort") {
    import spark.implicits._
    val logs = Seq(
      LogMessage("j1", "DEBUG", "core", "a", ts("2025-09-01 10:00:00")),
      LogMessage("j1", "WARN", "core", "b", ts("2025-09-01 10:00:01")),
      LogMessage("j1", "ERROR", "core", "c", ts("2025-09-01 10:00:02")),
      LogMessage("j2", "FATAL", "core", "d", ts("2025-09-01 10:00:03"))).toDF()
    val got = LogQuery.run(logs, LogQuery.LogQueryParams(
      minLevel = Some("WARN"), maxLevel = Some("ERROR"), sortBy = "level",
      ascending = false)).select("message").collect().map(_.getString(0))
    assert(got.toSeq == Seq("c", "b"))
  }

  test("ship filter: empty component set is a wildcard") {
    import spark.implicits._
    val logs = Seq(
      LogMessage("j1", "ERROR", "db", "x", ts("2025-09-01 10:00:00")),
      LogMessage("j1", "INFO", "api", "y", ts("2025-09-01 10:00:01"))).toDF()
    assert(LogQuery.shipFilter(logs, Seq("ERROR", "FATAL"), Seq.empty).count() == 1)
    assert(LogQuery.shipFilter(logs, Seq("INFO"), Seq("db")).count() == 0)
  }
}
