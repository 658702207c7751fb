package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.WebSocketMessage

/** The streaming→WebSocket seam: a `foreachBatch` body that pushes each
  * micro-batch of event rows through the live [[WsServer]] fan-out —
  * the reference's job-monitoring loop where ETL status/log events
  * reach connected dashboards as they happen (src/message_broadcaster
  * .cpp broadcastJobUpdate → sendToMatchingConnections; the WS manager
  * holds the sockets, the broadcaster filters per connection).
  *
  * Per-connection filtering happens inside [[WsServer.Server.broadcast]]
  * via [[FilterManager.testFilter]] — the JVM mirror of
  * [[Routing.shouldReceive]] — so the rows each client receives are
  * exactly what q34's routing join predicts for the same filter table
  * (pinned end-to-end by ApiSpec's live-socket case).
  *
  * Scale stance: this is CONTROL-PLANE fan-out (operator dashboards;
  * the reference caps connections in the hundreds), not a data sink —
  * bulk egress belongs to the batch/streaming sinks. The collect here
  * is therefore deliberate and bounded: each micro-batch pushes at most
  * `maxPerBatch` rows, chosen deterministically (earliest by timestamp,
  * ties by payload), and the overflow is COUNTED, not silent — the same
  * drop-on-full-with-accounting policy the in-plan QoS applies
  * ([[Batching]]'s droppedCount). A pipeline that routinely overflows
  * the cap is using the wrong sink, and the counter is how that shows.
  *
  * Expects the [[WebSocketMessage]] shape: msgType (string), timestamp
  * (timestamp), data (string), targetJobId / targetLevel (nullable
  * strings). Extra columns are ignored.
  */
object WsPush {

  /** Messages dropped by the per-batch cap since JVM start (monotone,
    * global across sinks — the health surface's queue-drop view). */
  val droppedTotal = new AtomicLong(0L)

  /** `foreachBatch` body: `stream.writeStream.foreachBatch(
    * WsPush.sink(server) _)`. Returns rows pushed for the batch via
    * the server's `messagesSent` counter; drops land in
    * [[droppedTotal]]. */
  def sink(server: WsServer.Server, maxPerBatch: Int = 1000)
      (batch: DataFrame, batchId: Long): Unit = {
    val projected = batch.select(
      col("msgType").cast("string"),
      col("timestamp").cast("timestamp"),
      col("data").cast("string"),
      col("targetJobId").cast("string"),
      col("targetLevel").cast("string"))
    // deterministic head under the cap: a replayed batch (foreachBatch
    // is at-least-once) re-pushes the SAME rows, and the dropped tail
    // is a stable set rather than whichever partitions lost the race
    val head = projected
      .orderBy(col("timestamp"), col("data"))
      .limit(maxPerBatch + 1)
      .collect()
    val over = head.length > maxPerBatch
    if (over) {
      // the +1 row proved overflow; count the real remainder once
      val total = projected.count()
      droppedTotal.addAndGet(total - maxPerBatch)
      ()
    }
    head.iterator.take(maxPerBatch).foreach { r =>
      server.broadcast(WebSocketMessage(
        msgType = r.getString(0),
        timestamp = r.getTimestamp(1),
        data = r.getString(2),
        targetJobId = Option(r.getString(3)),
        targetLevel = Option(r.getString(4))))
      ()
    }
  }
}
