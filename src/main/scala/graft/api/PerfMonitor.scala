package graft.api

import java.util.concurrent.atomic.AtomicLong

/** Request-level performance metrics with the reference's export
  * surface (`include/performance_monitor.hpp:32-366`): total and
  * active request counters, a running average duration, a bounded
  * reservoir of recent durations for the p95/p99 percentiles
  * (`getPercentileResponseTime`, index = p·(n−1) over the sorted
  * sample — mirrored exactly), requests/sec, and the two export
  * formats `getMetricsAsJson` / `getMetricsAsPrometheus` (same metric
  * names, HELP/TYPE lines, and field order).
  *
  * Connection-level counters (reuse, connection/request timeouts) are
  * transport internals the JDK HttpServer manages privately — they are
  * emitted with value 0 to preserve the exposition shape, and their
  * HELP text is kept verbatim so a scraper sees the same series.
  *
  * Thread-safe: counters are atomics; the duration reservoir is a
  * synchronized ring (the reference holds a mutex over its sample
  * vector the same way, keeping the most recent 10000 samples —
  * performance_monitor.hpp:133-141; a ring buffer gives the same
  * "most recent N" window without the vector erase). */
final class PerfMonitor(clock: () => Long = () => System.nanoTime()) {

  private val totalRequests = new AtomicLong(0L)
  private val activeRequests = new AtomicLong(0L)
  private val completedRequests = new AtomicLong(0L)
  private val totalDurationMs = new AtomicLong(0L)
  private val startedNanos = clock()

  private val SampleCap = 10000
  private val samples = new Array[Long](SampleCap)
  private var sampleCount = 0
  private var sampleNext = 0

  def requestStart(): Unit = {
    totalRequests.incrementAndGet()
    activeRequests.incrementAndGet()
    ()
  }

  def requestEnd(durationMs: Long): Unit = {
    activeRequests.decrementAndGet()
    completedRequests.incrementAndGet()
    totalDurationMs.addAndGet(durationMs)
    samples.synchronized {
      samples(sampleNext) = durationMs
      sampleNext = (sampleNext + 1) % SampleCap
      if (sampleCount < SampleCap) sampleCount += 1
    }
    ()
  }

  def total: Long = totalRequests.get()
  def active: Long = activeRequests.get()

  def averageMs: Double = {
    val n = completedRequests.get()
    if (n == 0) 0.0 else totalDurationMs.get().toDouble / n
  }

  /** One sorted snapshot of the reservoir: the COPY happens under the
    * lock (a 10k-long memcpy), the SORT outside it — so a scrape never
    * blocks concurrent requestEnd calls for the sort's duration, and
    * one snapshot serves both exported percentiles. */
  private def sortedSnapshot(): Array[Long] = {
    val copy = samples.synchronized {
      java.util.Arrays.copyOf(samples, sampleCount)
    }
    java.util.Arrays.sort(copy)
    copy
  }

  /** The reference's percentile index p·(n−1) over a sorted snapshot. */
  private def pctOf(sorted: Array[Long], p: Double): Long =
    if (sorted.isEmpty) 0L else sorted((p * (sorted.length - 1)).toInt)

  def percentileMs(p: Double): Long = pctOf(sortedSnapshot(), p)

  /** The reference computes INTEGER requests/sec: size_t totalRequests
    * divided by truncated whole elapsed seconds, only once at least one
    * full second has passed (performance_monitor.hpp:192-200). Mirrored
    * exactly — the exported value is a whole number, never scientific
    * notation. */
  def requestsPerSecond: Long = {
    val elapsedSec = (clock() - startedNanos) / 1000000000L
    if (elapsedSec <= 0) 0L else totalRequests.get() / elapsedSec
  }

  /** `getMetricsAsJson` parity (field set and order;
    * performance_monitor.hpp:262-289). */
  def json: String = {
    val snap = sortedSnapshot()
    s"""{"totalRequests":${totalRequests.get()},""" +
      s""""activeRequests":${activeRequests.get()},""" +
      s""""averageResponseTime":$averageMs,""" +
      s""""connectionReuses":0,"totalConnections":0,""" +
      s""""connectionTimeouts":0,"requestTimeouts":0,""" +
      s""""connectionReuseRate":0.0,""" +
      s""""requestsPerSecond":$requestsPerSecond,""" +
      s""""p95ResponseTime":${pctOf(snap, 0.95)},""" +
      s""""p99ResponseTime":${pctOf(snap, 0.99)}}"""
  }

  /** `getMetricsAsPrometheus` parity (performance_monitor.hpp:296-366):
    * same series names, HELP/TYPE lines, and order, `\n\n` separated. */
  def prometheus: String = {
    val snap = sortedSnapshot()
    val sb = new StringBuilder
    def metric(name: String, help: String, tpe: String, value: String): Unit = {
      sb.append(s"# HELP $name $help\n")
      sb.append(s"# TYPE $name $tpe\n")
      sb.append(s"$name $value\n\n")
      ()
    }
    metric("http_requests_total", "Total number of HTTP requests",
      "counter", totalRequests.get().toString)
    metric("http_requests_active", "Current number of active HTTP requests",
      "gauge", activeRequests.get().toString)
    metric("http_request_duration_ms",
      "Average HTTP request duration in milliseconds", "gauge",
      averageMs.toString)
    metric("http_connections_reused_total",
      "Total number of connection reuses", "counter", "0")
    metric("http_connections_total", "Total number of connections created",
      "counter", "0")
    metric("http_connection_timeouts_total",
      "Total number of connection timeouts", "counter", "0")
    metric("http_request_timeouts_total",
      "Total number of request timeouts", "counter", "0")
    metric("http_connection_reuse_rate",
      "Connection reuse rate (0.0 to 1.0)", "gauge", "0.0")
    metric("http_requests_per_second", "Current requests per second",
      "gauge", requestsPerSecond.toString)
    metric("http_request_duration_p95_ms",
      "95th percentile request duration in milliseconds", "gauge",
      pctOf(snap, 0.95).toString)
    // final series ends with a single newline (reference: one "\n")
    sb.append("# HELP http_request_duration_p99_ms 99th percentile request " +
      "duration in milliseconds\n")
    sb.append("# TYPE http_request_duration_p99_ms gauge\n")
    sb.append(s"http_request_duration_p99_ms ${pctOf(snap, 0.99)}\n")
    sb.toString
  }
}
