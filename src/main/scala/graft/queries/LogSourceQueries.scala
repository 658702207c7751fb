package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.LogQuery
import graft.sources.LogFileSource

/** S7 end-to-end: typed rows → reference-format text lines → REAL files
  * on disk → `spark.read.text` + regex parse (filename/lineNumber
  * provenance) → the declared log query. The DuckDB oracle re-derives the
  * expected output purely from the events table (line numbers via
  * ROW_NUMBER over the written sort order), so the parse + provenance
  * must round-trip exactly to hash-match.
  */
object LogSourceQueries {

  val entries: Map[String, QueryDef] = Map(

    "q48_logfile_source" -> QueryDef(
      """WITH logs AS (
        |  SELECT event_id,
        |         date_trunc('second', ts) AS ts2,
        |         CASE event_type WHEN 'click' THEN 'DEBUG' WHEN 'view' THEN 'INFO'
        |              WHEN 'signup' THEN 'WARN' WHEN 'purchase' THEN 'ERROR'
        |              ELSE 'FATAL' END AS level,
        |         'comp' || (user_id % 4) AS component,
        |         'job_' || (user_id % 50) AS jobId,
        |         'thr' || (event_id % 3) AS threadId,
        |         'evt ' || props || ' | job_id=job_' || (user_id % 50) ||
        |           ' thread=thr' || (event_id % 3) AS message
        |  FROM events),
        |numbered AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY event_id) AS lineNumber
        |  FROM logs),
        |f AS (
        |  SELECT * FROM numbered
        |  WHERE ts2 >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND ts2 <= TIMESTAMP '2024-01-28 00:00:00'
        |    AND (CASE level WHEN 'DEBUG' THEN 0 WHEN 'INFO' THEN 1 WHEN 'WARN' THEN 2
        |         WHEN 'ERROR' THEN 3 WHEN 'FATAL' THEN 4 ELSE -1 END) BETWEEN 1 AND 3
        |    AND component = 'comp2' AND jobId = 'job_10')
        |SELECT CAST(lineNumber AS BIGINT) AS lineNumber, level, component,
        |       jobId, threadId,
        |       strftime(ts2, '%Y-%m-%d %H:%M:%S') AS ts_str, message
        |FROM f
        |ORDER BY (CASE level WHEN 'DEBUG' THEN 0 WHEN 'INFO' THEN 1 WHEN 'WARN' THEN 2
        |          WHEN 'ERROR' THEN 3 WHEN 'FATAL' THEN 4 ELSE -1 END) DESC,
        |         lineNumber ASC
        |LIMIT 200 OFFSET 2""".stripMargin) { (s, dir) =>
      val typed = Tables(s, dir).events.select(
        col("event_id"),
        date_trunc("second", col("ts")).as("timestamp"),
        when(col("event_type") === "click", "DEBUG")
          .when(col("event_type") === "view", "INFO")
          .when(col("event_type") === "signup", "WARN")
          .when(col("event_type") === "purchase", "ERROR")
          .otherwise("FATAL").as("level"),
        concat(lit("comp"), col("user_id") % 4).as("component"),
        concat(lit("evt "), col("props"),
          lit(" | job_id=job_"), col("user_id") % 50,
          lit(" thread=thr"), col("event_id") % 3).as("message"))
      // one deterministic file: lines in event_id order → lineNumber is
      // reproducible as ROW_NUMBER() OVER (ORDER BY event_id). The
      // fixture derives solely from the immutable sf tables, so it is
      // written once per sf dir and reused (_SUCCESS as the marker).
      val logDir = sys.props("java.io.tmpdir") + "/graft_q48_logs_" +
        java.lang.Integer.toHexString(dir.hashCode)
      // line-count staleness witness, same contract as the q87 fixture
      val stale = !new java.io.File(logDir, "_SUCCESS").isFile ||
        s.read.textFile(logDir).count() != typed.count()
      if (stale)
        LogFileSource.formatLine(typed.repartition(1).sortWithinPartitions("event_id"))
          .write.mode("overwrite").text(logDir)
      val parsed = LogFileSource.read(s, logDir)
      val p = LogQuery.LogQueryParams(
        startTime = Some(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
        endTime = Some(java.sql.Timestamp.valueOf("2024-01-28 00:00:00")),
        minLevel = Some("INFO"), maxLevel = Some("ERROR"),
        component = Some("comp2"), jobId = Some("job_10"),
        sortBy = "level", ascending = false,
        maxResults = 200, offset = 2)
      LogQuery.run(parsed, p, tieBreaker = Some(col("lineNumber")))
        .select(col("lineNumber"), col("level"), col("component"),
          col("jobId"), col("threadId"),
          date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          col("message"))
    },

    // JSONL corpus ingestion round-trip: documents serialized to a
    // JSON-lines fixture with every 97th doc's line corrupted; the
    // permissive reader must recover EXACTLY the uncorrupted docs
    // byte-for-byte (JSON escape/unescape is lossless) and quarantine
    // the rest. The oracle re-derives the survivor set from the
    // immutable table, so any silent drop or mangled text fails the
    // value compare.
    "q87_jsonl_source" -> QueryDef(
      """SELECT doc_id, text FROM documents
        |WHERE doc_id % 97 != 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir).documents.select(col("doc_id"), col("text"))
      val jsonDir = sys.props("java.io.tmpdir") + "/graft_q87_jsonl_" +
        java.lang.Integer.toHexString(dir.hashCode)
      // reuse the fixture only while it still matches the source table:
      // the path keys on the sf DIR, so regenerated data at the same
      // path (or a tmp cleaner eating files) must trigger a rewrite,
      // not a silent stale read — line count is the cheap witness
      val stale = !new java.io.File(jsonDir, "_SUCCESS").isFile ||
        s.read.textFile(jsonDir).count() != d.count()
      if (stale)
        d.select(
          when(col("doc_id") % 97 === 0,
            concat(lit("{broken line for doc "), col("doc_id")))
            .otherwise(to_json(struct(col("doc_id"), col("text"))))
            .as("value"))
          .write.mode("overwrite").text(jsonDir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val (good, _) = graft.sources.JsonlSource.read(s, jsonDir, schema)
      good.orderBy(col("doc_id"))
    }
  )
}
