package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.operators.LogQuery

/** ST2/S8: multi-destination batched log shipping — the aggregator's
  * queue→worker→filter→batch→ship pipeline as a Structured Streaming
  * `foreachBatch` dispatcher (reference: include/log_aggregator.hpp:24-63,
  * 230-283; worker src/log_aggregator.cpp).
  *
  * Each destination declares the reference's config: allowed levels,
  * allowed components (empty = wildcard), and a writer. The FILE writer is
  * real (JSON-lines partitioned output — at scale this is an append-only
  * date-partitioned parquet/json sink); network destinations
  * (ELASTICSEARCH / HTTP / SYSLOG / CLOUDWATCH / SPLUNK) share the same
  * interface with transport stubbed, since this environment has no egress
  * — the Spark-side semantics (filter, batch, dispatch) are identical and
  * tested.
  */
object LogShipper {

  /** Destination config (reference: include/log_aggregator.hpp:40-63). */
  final case class Destination(
      name: String,
      destinationType: String, // FILE | ELASTICSEARCH | HTTP_ENDPOINT | ...
      allowedLevels: Seq[String],
      allowedComponents: Seq[String] = Seq.empty,
      path: Option[String] = None,
      maxRetries: Int = 3,          // reference: log_aggregator.hpp:56
      retryDelayMillis: Long = 5000 // reference: log_aggregator.hpp:57
  )

  /** One shipped batch's outcome, for the aggregator stats surface
    * (reference: include/log_aggregator.hpp:203-223). */
  final case class ShipResult(destination: String, batchId: Long, shipped: Long)

  type Writer = (DataFrame, Long, Destination) => Unit

  /** FILE destination: append JSON lines under path/destination=name. */
  val fileWriter: Writer = (batch, batchId, dest) => {
    val target = dest.path.getOrElse(
      sys.props("java.io.tmpdir") + s"/graft-logs/${dest.name}")
    batch.select(to_json(struct(batch.columns.map(col): _*)).as("value"))
      .write.mode("append").text(target)
  }

  /** Transport-stubbed writer for network destinations: materializes the
    * batch (so the plan executes identically) and hands the payload to a
    * pluggable transport. Default transport is a no-op sink. */
  def stubNetworkWriter(transport: Seq[String] => Unit = _ => ()): Writer =
    (batch, _, _) => {
      val payload = batch
        .select(to_json(struct(batch.columns.map(col): _*)).as("value"))
        .collect().map(_.getString(0)).toSeq
      transport(payload)
    }

  @volatile private var shipped: Vector[ShipResult] = Vector.empty
  def stats: Seq[ShipResult] = shipped
  def resetStats(): Unit = synchronized { shipped = Vector.empty }

  /** Ship one micro-batch to every destination through its level/component
    * filter (P10). Retries per destination with the reference's
    * max-3/backoff policy. */
  def shipBatch(batch: DataFrame, batchId: Long,
      destinations: Seq[(Destination, Writer)]): Unit = {
    // one pass per destination over the (small) micro-batch; cache so the
    // per-destination filters don't re-read the source
    batch.persist()
    try destinations.foreach { case (dest, writer) =>
      val filtered = LogQuery.shipFilter(batch, dest.allowedLevels, dest.allowedComponents)
      val n = filtered.count()
      if (n > 0) {
        var attempt = 0
        var done = false
        while (!done) {
          try { writer(filtered, batchId, dest); done = true }
          catch {
            case e: Exception if attempt < dest.maxRetries =>
              attempt += 1
              Thread.sleep(math.min(dest.retryDelayMillis, 100L) * attempt)
          }
        }
      }
      synchronized { shipped = shipped :+ ShipResult(dest.name, batchId, n) }
    } finally batch.unpersist()
  }

  /** Attach the shipper to a streaming log Dataset with the reference's
    * 30 s batch cadence (reference: include/log_aggregator.hpp:55). */
  def start(logs: DataFrame, destinations: Seq[(Destination, Writer)],
      checkpoint: String, triggerMillis: Long = 30000): StreamingQuery =
    logs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMillis))
      .foreachBatch((b: Dataset[Row], id: Long) => shipBatch(b.toDF(), id, destinations))
      .start()

  /** ST3: priority ordering within a micro-batch before fan-out — the
    * broadcaster drains its queue highest-priority-first
    * (reference: include/message_broadcaster.hpp:52-63; the drop-on-full
    * lossy QoS is a queue property documented, not replicated). */
  def prioritized(batch: DataFrame, priorityCol: String = "priority"): DataFrame =
    if (batch.columns.contains(priorityCol))
      batch.orderBy(col(priorityCol).desc)
    else batch

  /** ST9: alert stream — threshold filter over a metrics stream
    * (reference: include/notification_service.hpp:22-131; thresholds
    * memory 85%, cpu 90%, job timeout 25 min from config/config.json:108-134). */
  def alerts(metrics: DataFrame,
      memoryThresholdPct: Double = 85.0,
      cpuThresholdPct: Double = 90.0,
      jobTimeoutMillis: Long = 25L * 60 * 1000): DataFrame = {
    val mem = metrics.filter(col("memoryPct") > memoryThresholdPct)
      .withColumn("alertType", lit("MEMORY"))
    val cpu = metrics.filter(col("cpuPct") > cpuThresholdPct)
      .withColumn("alertType", lit("CPU"))
    val timeout = metrics.filter(col("executionTimeMs") > jobTimeoutMillis)
      .withColumn("alertType", lit("JOB_TIMEOUT"))
    mem.unionByName(cpu).unionByName(timeout)
  }
}
