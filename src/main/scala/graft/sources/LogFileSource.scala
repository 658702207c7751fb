package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S7: the log-file line source — text log files → typed
  * `HistoricalLogEntry` rows with filename + per-file line numbers
  * (reference: include/log_file_manager.hpp:26-43 HistoricalLogEntry;
  * src/log_file_manager.cpp:687-721 reads files line-by-line tracking
  * lineNumber; line format from src/logger.cpp:386-399:
  * `[yyyy-MM-dd HH:mm:ss.SSS] [LEVEL] [component] message | k=v ...`,
  * level padded to 5 chars, optional `key=value` context suffix carrying
  * job_id / thread).
  *
  * Scale: `spark.read.text` splits large files by range and distributes
  * parsing; the regex projection is a narrow per-row transform fused into
  * the scan. Line numbers come from a per-file window over the read order
  * — exact when each file maps to one split (the common case for rotated
  * app logs; `maxPartitionBytes` controls it), the same contract the
  * reference's sequential reader provides per file.
  */
object LogFileSource {

  /** `[ts.millis] [LVL  ] [component] message` — level may be space-padded. */
  private val LineRe =
    "^\\[(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{3})\\] " +
      "\\[([A-Z]+) *\\] \\[([^\\]]*)\\] (.*)$"

  /** Raw lines with provenance: filename (basename) + 1-based per-file
    * line number. */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val w = Window.partitionBy(col("filename"))
      .orderBy(monotonically_increasing_id())
    spark.read.text(path)
      .withColumn("filename", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .withColumn("lineNumber", row_number().over(w).cast("long"))
  }

  /** Parse raw lines into the HistoricalLogEntry shape. Lines that do not
    * match the format keep their raw text as `message` with null
    * level/timestamp (the reference's stub treats every line as opaque
    * text; we surface malformed lines instead of dropping them). jobId /
    * threadId come from the structured context suffix when present. */
  def parse(raw: DataFrame): DataFrame = {
    val ts = regexp_extract(col("value"), LineRe, 1)
    val level = regexp_extract(col("value"), LineRe, 2)
    val matched = level =!= ""
    raw.select(
      when(matched, to_timestamp(ts, "yyyy-MM-dd HH:mm:ss.SSS")).as("timestamp"),
      when(matched, level).as("level"),
      when(matched, regexp_extract(col("value"), LineRe, 3)).as("component"),
      when(matched, regexp_extract(col("value"), LineRe, 4))
        .otherwise(col("value")).as("message"),
      nullif(regexp_extract(col("value"), "\\bjob_id=(\\S+)", 1), lit("")).as("jobId"),
      nullif(regexp_extract(col("value"), "\\bthread=(\\S+)", 1), lit("")).as("threadId"),
      col("filename"), col("lineNumber"))
  }

  /** Read + parse in one step: the full S7 source. */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(readRaw(spark, path))

  /** Render typed log rows back into the reference's text line format —
    * used to build fixtures and as the FILE-destination line codec.
    * `levelToString` pads to 5 chars (src/logger.cpp:357-372). */
  def formatLine(df: DataFrame): DataFrame =
    df.select(concat(
      lit("["), date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss.SSS"), lit("] "),
      lit("["), rpad(col("level"), 5, " "), lit("] "),
      lit("["), col("component"), lit("] "),
      col("message")).as("value"))
}
