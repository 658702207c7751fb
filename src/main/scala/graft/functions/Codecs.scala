package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's serialization quirks as explicit codec functions
  * (SURVEY §1.2 / §2.4 / §7.4 risks 1+3 — these are the edge semantics
  * an oracle diff catches first).
  */
object Codecs {

  /** Timestamps with epoch 0 serialize as SQL NULL, and the literal
    * string "NULL" is treated as null on read
    * (reference: src/etl_job_repository.cpp:22-27, 382-389). */
  def writeTimestampSentinel(ts: Column): Column =
    when(unix_timestamp(ts) === 0, lit(null).cast("string"))
      .otherwise(date_format(ts, "yyyy-MM-dd HH:mm:ss"))

  def readTimestampSentinel(s: Column): Column =
    when(s.isNull || s === "NULL", lit(null).cast("timestamp"))
      .otherwise(to_timestamp(s, "yyyy-MM-dd HH:mm:ss"))

  /** ISO-8601 parse with failure → now() (reference:
    * src/request_handler.cpp:1455-1487 — `now` injected for determinism;
    * production callers pass current_timestamp()). */
  def parseIsoOrNow(s: Column, now: Column = current_timestamp()): Column =
    coalesce(
      to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ss.SSSX"),
      to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ssX"),
      to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ss"),
      now)

  /** Reference wire format `%Y-%m-%d %H:%M:%S` UTC
    * (reference: src/request_handler.cpp:1455-1466). */
  def formatTimestamp(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd HH:mm:ss")
}
