package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Validators

/** The DECLARED log-query semantics (reference: include/log_file_manager.hpp:
  * 45-61 — LogQueryParams): time range, min/max level over the severity
  * order, component, jobId, threadId, substring or regex text match,
  * sortBy {timestamp, level, component} asc/desc, maxResults + offset.
  *
  * The reference ships only a substring-scan stub
  * (src/log_file_manager.cpp:686-721) — per SURVEY.md we implement the
  * declared surface; [[substringScan]] keeps the stub as the conformance
  * floor.
  *
  * Scale: filters compile to pushable predicates over the log table scan
  * (level-ordinal is a CASE chain on a low-cardinality column); sort+
  * offset+limit plans as TakeOrderedAndProject when limit is small.
  */
object LogQuery {

  final case class LogQueryParams(
      startTime: Option[Timestamp] = None,
      endTime: Option[Timestamp] = None,
      minLevel: Option[String] = None,
      maxLevel: Option[String] = None,
      component: Option[String] = None,
      jobId: Option[String] = None,
      threadId: Option[String] = None,
      searchText: Option[String] = None,
      useRegex: Boolean = false,
      sortBy: String = "timestamp", // timestamp | level | component
      ascending: Boolean = true,
      maxResults: Int = 1000,
      offset: Int = 0)

  /** Full declared semantics. `tieBreaker` forces a total order (the
    * reference leaves ties unspecified; determinism needs a unique key). */
  def run(logs: DataFrame, p: LogQueryParams,
      tieBreaker: Option[Column] = None): DataFrame = {
    var df = logs
    p.startTime.foreach(t => df = df.filter(col("timestamp") >= lit(t)))
    p.endTime.foreach(t => df = df.filter(col("timestamp") <= lit(t)))
    p.minLevel.foreach(l =>
      df = df.filter(Validators.levelOrdinal(col("level")) >=
        graft.model.LogLevel.ordinalOf(l)))
    p.maxLevel.foreach(l =>
      df = df.filter(Validators.levelOrdinal(col("level")) <=
        graft.model.LogLevel.ordinalOf(l)))
    p.component.foreach(c => df = df.filter(col("component") === c))
    p.jobId.foreach(j => df = df.filter(col("jobId") === j))
    p.threadId.foreach(t => df = df.filter(col("threadId") === t))
    p.searchText.foreach { s =>
      df = if (p.useRegex) df.filter(col("message").rlike(s))
      else df.filter(col("message").contains(s))
    }
    val sortCol = p.sortBy match {
      case "level"     => Validators.levelOrdinal(col("level"))
      case "component" => col("component")
      case _           => col("timestamp")
    }
    val primary = if (p.ascending) sortCol.asc else sortCol.desc
    val order = primary +: tieBreaker.map(_.asc).toSeq
    df.orderBy(order: _*).offset(p.offset).limit(p.maxResults)
  }

  /** The shipped stub behavior: bare substring scan, caps at maxResults
    * (reference: src/log_file_manager.cpp:686-721) — conformance floor. */
  def substringScan(lines: DataFrame, searchText: String, maxResults: Int): DataFrame =
    lines.filter(col("value").contains(searchText)).limit(maxResults)

  /** P10: per-destination ship filter — allowed levels + components,
    * empty component set = wildcard (reference: include/log_aggregator.hpp:60-63). */
  def shipFilter(logs: DataFrame, allowedLevels: Seq[String],
      allowedComponents: Seq[String]): DataFrame = {
    val levelOk = col("level").isin(allowedLevels: _*)
    val compOk = if (allowedComponents.isEmpty) lit(true)
      else col("component").isin(allowedComponents: _*)
    logs.filter(levelOk && compOk)
  }
}
