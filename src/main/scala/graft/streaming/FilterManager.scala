package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.{ConnectionFilters, WebSocketMessage}

/** WS filter-management REST surface (§2.11: get/set/update/clear
  * connection filters, templates, batch apply, test-filter —
  * reference: include/websocket_filter_manager.hpp:26-100), as a
  * control-plane service over the subscriptions table.
  *
  * The table is tiny (one row per live connection) — every mutation is a
  * full functional update; [[Routing.route]] broadcasts it against the
  * event stream.
  */
object FilterManager {

  /** Named filter templates (reference: websocket_filter_manager.hpp
    * filter templates). */
  val Templates: Map[String, ConnectionFilters => ConnectionFilters] = Map(
    "errors-only" -> (f => f.copy(logLevels = Seq("ERROR", "FATAL"),
      messageTypes = Seq(graft.model.MessageType.JobLogMessage))),
    "status-only" -> (f => f.copy(messageTypes = Seq(
      graft.model.MessageType.JobStatusUpdate,
      graft.model.MessageType.JobProgressUpdate))),
    "everything" -> (f => ConnectionFilters(f.connectionId)))

  def get(subs: Seq[ConnectionFilters], connectionId: String): Option[ConnectionFilters] =
    subs.find(_.connectionId == connectionId)

  /** Set (replace-or-insert) one connection's filters. */
  def set(subs: Seq[ConnectionFilters], f: ConnectionFilters): Seq[ConnectionFilters] =
    subs.filterNot(_.connectionId == f.connectionId) :+ f

  /** Partial update via copy function; no-op if the connection is absent. */
  def update(subs: Seq[ConnectionFilters], connectionId: String,
      change: ConnectionFilters => ConnectionFilters): Seq[ConnectionFilters] =
    subs.map(f => if (f.connectionId == connectionId) change(f) else f)

  /** Clear = reset to match-all (reference semantics: empty lists are
    * wildcards, not "receive nothing"). */
  def clear(subs: Seq[ConnectionFilters], connectionId: String): Seq[ConnectionFilters] =
    update(subs, connectionId, f => ConnectionFilters(f.connectionId))

  def applyTemplate(subs: Seq[ConnectionFilters], connectionId: String,
      template: String): Either[String, Seq[ConnectionFilters]] =
    Templates.get(template)
      .toRight(s"unknown template: $template")
      .map(t => update(subs, connectionId, t))

  /** Batch apply a template to many connections. */
  def batchApplyTemplate(subs: Seq[ConnectionFilters], connectionIds: Seq[String],
      template: String): Either[String, Seq[ConnectionFilters]] =
    Templates.get(template)
      .toRight(s"unknown template: $template")
      .map(t => subs.map(f =>
        if (connectionIds.contains(f.connectionId)) t(f) else f))

  /** Test-filter endpoint: would this connection receive this message?
    * Scala-side mirror of Routing.shouldReceive for single-message
    * checks (reference: test-filter REST op). */
  def testFilter(f: ConnectionFilters, m: WebSocketMessage): Boolean = {
    val typeOk = f.messageTypes.isEmpty || f.messageTypes.contains(m.msgType)
    val jobOk = m.targetJobId.isEmpty || f.jobIds.isEmpty ||
      m.targetJobId.exists(f.jobIds.contains)
    val levelOk = m.targetLevel.isEmpty || f.logLevels.isEmpty ||
      m.targetLevel.exists(f.logLevels.contains)
    val sysOk = m.msgType != graft.model.MessageType.SystemNotification ||
      f.includeSystemNotifications
    typeOk && jobOk && levelOk && sysOk
  }

  /** Materialize the subscription table for the routing join. */
  def toDF(subs: Seq[ConnectionFilters])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    subs.toDF()
  }
}
