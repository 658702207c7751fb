package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ConnectionFilters, WebSocketMessage}
import graft.streaming.FilterManager

/** FilterManager CRUD truth table + event-time watermark behavior (the
  * streaming extension beyond the reference's processing-time model). */
class FilterWatermarkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("filter-wm-spec", "4").getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  private val subs = Seq(
    ConnectionFilters("c1"),
    ConnectionFilters("c2", Seq("job_1"), Seq("ERROR", "FATAL"),
      Seq("JOB_LOG_MESSAGE"), includeSystemNotifications = false))

  test("filter CRUD: set/update/clear/templates") {
    val added = FilterManager.set(subs, ConnectionFilters("c3", Seq("job_9")))
    assert(added.length == 3)
    assert(FilterManager.get(added, "c3").exists(_.jobIds == Seq("job_9")))
    val cleared = FilterManager.clear(added, "c3")
    assert(FilterManager.get(cleared, "c3").exists(_.jobIds.isEmpty))
    val templated = FilterManager.applyTemplate(added, "c1", "errors-only")
    assert(templated.toOption.get.find(_.connectionId == "c1")
      .exists(_.logLevels == Seq("ERROR", "FATAL")))
    assert(FilterManager.applyTemplate(subs, "c1", "nope").isLeft)
    val batch = FilterManager.batchApplyTemplate(added, Seq("c1", "c3"), "status-only")
    assert(batch.toOption.get.count(_.messageTypes ==
      Seq("JOB_STATUS_UPDATE", "JOB_PROGRESS_UPDATE")) == 2)
  }

  test("test-filter matches the reference truth table (FIXTURES.md §4)") {
    val errLog = WebSocketMessage("JOB_LOG_MESSAGE", ts("2025-09-01 10:00:00"),
      "{}", Some("job_1"), Some("ERROR"))
    val infoLog = errLog.copy(targetLevel = Some("INFO"))
    val otherJob = errLog.copy(targetJobId = Some("job_2"))
    val sysNote = WebSocketMessage("SYSTEM_NOTIFICATION", ts("2025-09-01 10:00:00"), "{}")
    val nullJob = errLog.copy(targetJobId = None)
    val c1 = subs(0); val c2 = subs(1)
    assert(FilterManager.testFilter(c1, errLog))   // wildcard receives all
    assert(FilterManager.testFilter(c1, sysNote))
    assert(FilterManager.testFilter(c2, errLog))
    assert(!FilterManager.testFilter(c2, infoLog)) // level filtered
    assert(!FilterManager.testFilter(c2, otherJob)) // job filtered
    assert(!FilterManager.testFilter(c2, sysNote)) // system opt-out
    assert(FilterManager.testFilter(c2, nullJob))  // null target bypasses job check
  }

  test("watermark drops events later than the threshold in append mode") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val agg = stream.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      stream.addData(
        (ts("2025-09-01 10:02:00"), "click", 1.0),
        (ts("2025-09-01 10:03:00"), "click", 1.0))
      q.processAllAvailable()
      // advance event time far past the first window + watermark
      stream.addData((ts("2025-09-01 11:00:00"), "click", 1.0))
      q.processAllAvailable()
      // late arrival for the long-closed 10:00 window: must be dropped
      stream.addData((ts("2025-09-01 10:04:00"), "click", 99.0))
      q.processAllAvailable()
      // re-advance so nothing more emits for the late row
      stream.addData((ts("2025-09-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window.start, n FROM wm_out ORDER BY window.start").collect()
      // the 10:00 window emitted exactly 2 (the late 10:04 event dropped)
      assert(rows.head.getTimestamp(0) == ts("2025-09-01 10:00:00"))
      assert(rows.head.getLong(1) == 2L)
    } finally q.stop()
  }

  test("ST8 extension: event-time windowed job metrics roll up per window") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long, Long)]
    val agg = stream.toDF().toDF("ts", "jobId", "records", "memBytes")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("jobId"))
      .agg(sum(col("records")).as("recordsProcessed"),
        max(col("memBytes")).as("peakMemory"),
        count(lit(1)).as("nUpdates"))
    val q = agg.writeStream.format("memory").queryName("wm_metrics")
      .outputMode("append").start()
    try {
      stream.addData(
        (ts("2025-09-01 10:01:00"), "j1", 100L, 512L),
        (ts("2025-09-01 10:04:00"), "j1", 50L, 2048L),
        (ts("2025-09-01 10:06:00"), "j2", 7L, 64L))
      q.processAllAvailable()
      // advance the watermark so the 10:00 window closes and emits
      stream.addData((ts("2025-09-01 10:30:00"), "j1", 1L, 1L))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT jobId, recordsProcessed, peakMemory, nUpdates
          |FROM wm_metrics WHERE window.start = TIMESTAMP '2025-09-01 10:00:00'
          |ORDER BY jobId""".stripMargin).collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq == Seq(("j1", 150L, 2048L, 2L), ("j2", 7L, 64L, 1L)))
    } finally q.stop()
  }
}
