package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P8/J4: event×subscription routing — every message tested against every
  * connection's filters (reference: src/job_monitoring_models.cpp:817-859,
  * src/message_broadcaster.cpp sendToMatchingConnections).
  *
  * Spark shape: a broadcast nested-loop join of the event stream against
  * the (small) subscriptions table with the conjunctive wildcard predicate
  * — each executor routes its own partition of events, no event shuffle.
  * Empty filter list = match-all; null event target = bypass that check.
  */
object Routing {

  /** The shouldReceiveMessage predicate as a join condition.
    * Expects events(msgType, targetJobId, targetLevel) and
    * subs(messageTypes, jobIds, logLevels, includeSystemNotifications). */
  def shouldReceive(e: DataFrame, s: DataFrame): Column = {
    val typeOk = size(s("messageTypes")) === 0 ||
      array_contains(s("messageTypes"), e("msgType"))
    val jobOk = e("targetJobId").isNull || size(s("jobIds")) === 0 ||
      array_contains(s("jobIds"), e("targetJobId"))
    val levelOk = e("targetLevel").isNull || size(s("logLevels")) === 0 ||
      array_contains(s("logLevels"), e("targetLevel"))
    val sysOk = e("msgType") =!= graft.model.MessageType.SystemNotification ||
      s("includeSystemNotifications")
    typeOk && jobOk && levelOk && sysOk
  }

  /** Route events to subscribers: one output row per (event, matching
    * connection). `subs` is broadcast — it is the control-plane table. */
  def route(events: DataFrame, subs: DataFrame): DataFrame =
    events.join(broadcast(subs), shouldReceive(events, subs))

  /** Delivery counts per connection (the broadcaster's per-connection
    * queue-depth view, reference: include/message_broadcaster.hpp:89-111). */
  def deliveryCounts(events: DataFrame, subs: DataFrame): DataFrame =
    route(events, subs).groupBy(col("connectionId"))
      .agg(count(lit(1)).as("n_messages"))
}
