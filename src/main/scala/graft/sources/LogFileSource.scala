package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapred.{FileSplit, TextInputFormat}
import org.apache.spark.rdd.HadoopRDD
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Scale: large files split by byte range and parse in parallel; the
  * regex projection is a narrow per-row transform fused into the scan.
  * Line numbers are EXACT even when a file spans multiple input splits:
  * pass 1 counts lines per split (narrow, no shuffle), the driver folds
  * the per-split counts into cumulative start offsets per file (one tiny
  * row per split — the same order of driver state Spark itself holds for
  * the split listing), and pass 2 numbers rows within each split from its
  * broadcast offset. No per-file global sort exists, so a 10 GB file is
  * parsed by ~80 parallel tasks instead of one straggler, and provenance
  * matches the reference's sequential per-file contract
  * (src/log_file_manager.cpp:687-721) bit-for-bit.
  */
object LogFileSource {

  /** `[ts.millis] [LVL  ] [component] message` — level may be space-padded. */
  private val LineRe =
    "^\\[(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{3})\\] " +
      "\\[([A-Z]+) *\\] \\[([^\\]]*)\\] (.*)$"

  /** Raw lines with provenance: filename (basename) + 1-based per-file
    * line number, split-safe (see scale note above).
    *
    * `minSplits` is the Hadoop split-count hint — old-API
    * `FileInputFormat` computes goalSize = totalBytes / minSplits, so
    * raising it forces one file across many splits (specs use this to
    * prove split-safety; production leaves the default and lets block
    * size govern). TextInputFormat assigns a line to the split containing
    * its first byte, so per-split counts partition the file's lines
    * exactly. */
  def readRaw(spark: SparkSession, path: String, minSplits: Int = 2): DataFrame = {
    import spark.implicits._
    val base = spark.sparkContext
      .hadoopFile(path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text], minSplits)
      .asInstanceOf[HadoopRDD[LongWritable, Text]]
    // pass 1: lines per split — narrow, no Text materialization
    val counts: Array[(String, Long, Long)] = base.mapPartitionsWithInputSplit { (split, iter) =>
      val fs = split.asInstanceOf[FileSplit]
      var n = 0L
      while (iter.hasNext) { iter.next(); n += 1 }
      Iterator((fs.getPath.toString, fs.getStart, n))
    }.collect()
    // cumulative start line per (file, splitStart), keyed by full path so
    // same-named files in different directories cannot collide
    val cum: Map[(String, Long), Long] = counts.groupBy(_._1).flatMap {
      case (file, splits) =>
        var acc = 0L
        splits.sortBy(_._2).map { case (_, start, n) =>
          val entry = ((file, start), acc)
          acc += n
          entry
        }
    }
    val cumB = spark.sparkContext.broadcast(cum)
    // pass 2: number rows within each split from its cumulative offset.
    // Text is reused by the record reader — copy via toString before the
    // iterator advances (map is lazy but per-element strict).
    base.mapPartitionsWithInputSplit { (split, iter) =>
      val fs = split.asInstanceOf[FileSplit]
      val name = fs.getPath.getName
      var line = cumB.value((fs.getPath.toString, fs.getStart))
      iter.map { case (_, text) =>
        line += 1
        (text.toString, name, line)
      }
    }.toDF("value", "filename", "lineNumber")
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
  def read(spark: SparkSession, path: String, minSplits: Int = 2): DataFrame =
    parse(readRaw(spark, path, minSplits))

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
