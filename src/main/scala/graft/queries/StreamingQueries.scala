package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.streaming.{JobRegistry, RateLimiter, Routing}

/** Batch-mode exercises of the streaming operators (the stateful logic is
  * identical in batch and micro-batch execution — flatMapGroupsWithState
  * runs the same transition function). Routing and rate limiting are
  * SQL-expressible and oracle-checked; the job registry's emit-dependent
  * suppression is not expressible in plain SQL, so it registers as a
  * rows-only entry and its semantics are covered by StreamingSpec.
  */
object StreamingQueries {

  val entries: Map[String, QueryDef] = Map(

    // P8/J4: subscription routing truth table over the events stream
    // (reference: src/job_monitoring_models.cpp:817-859).
    "q34_routing" -> QueryDef(
      """WITH ev AS (
        |  SELECT event_id,
        |    CASE event_type WHEN 'click' THEN 'JOB_STATUS_UPDATE'
        |      WHEN 'view' THEN 'JOB_PROGRESS_UPDATE'
        |      WHEN 'signup' THEN 'JOB_LOG_MESSAGE'
        |      WHEN 'purchase' THEN 'JOB_METRICS_UPDATE'
        |      ELSE 'SYSTEM_NOTIFICATION' END AS msgType,
        |    CASE WHEN user_id % 7 = 0 THEN NULL
        |         ELSE 'job_' || (user_id % 5) END AS targetJobId,
        |    CASE WHEN event_type = 'signup' THEN
        |           (CASE WHEN value > 100 THEN 'ERROR' ELSE 'INFO' END)
        |         ELSE NULL END AS targetLevel
        |  FROM events),
        |subs AS (
        |  SELECT * FROM (VALUES
        |    ('c1', CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[]), TRUE),
        |    ('c2', ['job_1'], ['ERROR','FATAL'], ['JOB_LOG_MESSAGE'], FALSE),
        |    ('c3', ['job_2','job_3'], CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[]), TRUE),
        |    ('c4', CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[]), FALSE))
        |    AS t(connectionId, jobIds, logLevels, messageTypes, includeSystemNotifications)),
        |routed AS (
        |  SELECT s.connectionId, e.event_id FROM ev e JOIN subs s ON
        |    (len(s.messageTypes) = 0 OR list_contains(s.messageTypes, e.msgType))
        |    AND (e.targetJobId IS NULL OR len(s.jobIds) = 0 OR list_contains(s.jobIds, e.targetJobId))
        |    AND (e.targetLevel IS NULL OR len(s.logLevels) = 0 OR list_contains(s.logLevels, e.targetLevel))
        |    AND (e.msgType <> 'SYSTEM_NOTIFICATION' OR s.includeSystemNotifications))
        |SELECT connectionId, count(*) AS n_messages
        |FROM routed GROUP BY connectionId ORDER BY connectionId""".stripMargin) { (s, dir) =>
      import s.implicits._
      val events = Tables(s, dir).events.select(
        col("event_id"),
        when(col("event_type") === "click", "JOB_STATUS_UPDATE")
          .when(col("event_type") === "view", "JOB_PROGRESS_UPDATE")
          .when(col("event_type") === "signup", "JOB_LOG_MESSAGE")
          .when(col("event_type") === "purchase", "JOB_METRICS_UPDATE")
          .otherwise("SYSTEM_NOTIFICATION").as("msgType"),
        when(col("user_id") % 7 === 0, lit(null))
          .otherwise(concat(lit("job_"), col("user_id") % 5)).as("targetJobId"),
        when(col("event_type") === "signup",
          when(col("value") > 100, "ERROR").otherwise("INFO"))
          .otherwise(lit(null)).as("targetLevel"))
      val subs = Seq(
        graft.model.ConnectionFilters("c1"),
        graft.model.ConnectionFilters("c2", Seq("job_1"), Seq("ERROR", "FATAL"),
          Seq("JOB_LOG_MESSAGE"), includeSystemNotifications = false),
        graft.model.ConnectionFilters("c3", Seq("job_2", "job_3")),
        graft.model.ConnectionFilters("c4",
          includeSystemNotifications = false)).toDF()
      Routing.deliveryCounts(events, subs).orderBy(col("connectionId"))
    },

    // ST4: enforce-before-increment rate limiting on a deterministic
    // synthetic request stream; with perMinute=1 the allowed decision
    // equals "first request in the (client, minute) window"
    // (reference: src/rate_limiter.cpp:48-88).
    "q35_rate_limiter" -> QueryDef(
      """WITH req AS (
        |  SELECT event_id, 'client_' || (user_id % 3) AS clientId,
        |         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(event_id * 13) AS ts
        |  FROM events),
        |win AS (
        |  SELECT clientId, ts,
        |         CAST(epoch(ts) AS BIGINT) // 60 AS mwin
        |  FROM req),
        |rn AS (
        |  SELECT clientId, ts,
        |         ROW_NUMBER() OVER (PARTITION BY clientId, mwin ORDER BY ts) AS r
        |  FROM win)
        |SELECT clientId, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, (r = 1) AS allowed
        |FROM rn ORDER BY ts_str LIMIT 5000""".stripMargin) { (s, dir) =>
      import s.implicits._
      val reqs = Tables(s, dir).events.select(
        concat(lit("client_"), col("user_id") % 3).as("clientId"),
        timestamp_seconds(
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000)
            + col("event_id") * 13).as("ts"),
        lit("/api/auth/login/attempt").as("endpoint"))
        .as[RateLimiter.Request]
      val rules = Seq(RateLimiter.RateRule("/api/auth/login", 1, 1000000))
      RateLimiter.limit(reqs, rules)
        .toDF()
        .select(col("clientId"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          col("allowed"))
        .orderBy(col("ts_str")).limit(5000)
    },

    // A13: running per-job counters over the event stream replay — the
    // cumulative totals every event would have published in update mode
    // (reference: job counter increments in src/job_monitor_service.cpp).
    "q51_running_counters" -> QueryDef(
      """WITH ev AS (
        |  SELECT 'job_' || (user_id % 20) AS jobId, event_id,
        |         CAST(trunc(value % 100) AS BIGINT) AS n
        |  FROM events)
        |SELECT jobId, event_id,
        |       CAST(SUM(n) OVER (PARTITION BY jobId ORDER BY event_id
        |                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS recordsProcessed,
        |       CAST(COUNT(*) OVER (PARTITION BY jobId ORDER BY event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS batches
        |FROM ev ORDER BY jobId, event_id LIMIT 5000""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events.select(
        concat(lit("job_"), col("user_id") % 20).as("jobId"),
        col("event_id"),
        (col("value") % 100).cast("long").as("n"))
      graft.operators.MetricsAggregations.runningCounters(ev)
        .select(col("jobId"), col("event_id"),
          col("recordsProcessed"), col("batches"))
        .orderBy(col("jobId"), col("event_id"))
        .limit(5000)
    },

    // ST8 extension: event-time tumbling windows with watermark late-drop,
    // replayed deterministically in batch. The streaming form
    // (withWatermark + window + append mode) is pinned by
    // FilterWatermarkSpec; this entry reproduces its semantics as exact
    // integer math so DuckDB can oracle it:
    //   - arrival order = event_id; micro-batches of 50 events;
    //   - event time = ts jittered back (event_id % 7) minutes, with a
    //     300-minute straggler every 53rd event (events.ts is monotone in
    //     event_id, so without stragglers no event is ever late; this
    //     pattern drops 5/188/1886 events at sf0.001/0.01/0.1);
    //   - watermark entering batch b = max event time over batches < b
    //     minus 10 min (Spark updates the watermark at batch boundaries
    //     from the previous batches' max — same contract);
    //   - events older than their batch's watermark drop;
    //   - append mode emits only windows closed at the final watermark.
    // All comparisons in epoch micros (exact cross-engine longs).
    "q63_watermark_windows" -> QueryDef(
      """WITH ev AS (
        |  SELECT event_id, event_type, value,
        |         epoch_us(ts) - (CASE WHEN event_id % 53 = 0 THEN 300
        |                              ELSE event_id % 7 END) * 60000000 AS ets_us,
        |         event_id // 50 AS batch
        |  FROM events),
        |bm AS (SELECT batch, max(ets_us) AS bmax FROM ev GROUP BY batch),
        |wm AS (SELECT batch,
        |         max(bmax) OVER (ORDER BY batch
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           - 600000000 AS wm_us
        |       FROM bm),
        |ok AS (SELECT e.* FROM ev e JOIN wm USING (batch)
        |       WHERE wm_us IS NULL OR ets_us >= wm_us),
        |fin AS (SELECT max(bmax) - 600000000 AS fwm FROM bm),
        |win AS (SELECT ets_us - (ets_us % 3600000000) AS w_us, event_type,
        |               count(*) AS n,
        |               CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
        |        FROM ok GROUP BY 1, 2)
        |SELECT strftime(make_timestamp(w_us), '%Y-%m-%d %H:%M:%S') AS wstart,
        |       event_type, n, sum_value
        |FROM win, fin WHERE w_us + 3600000000 <= fwm
        |ORDER BY wstart, event_type""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events.select(
        col("event_id"), col("event_type"), col("value"),
        // cast: parquet event ts may read as TIMESTAMP_NTZ (Spark 4 infers
        // NTZ when the file is not UTC-adjusted); session tz is pinned UTC,
        // so the cast is instant-preserving and unix_micros stays exact.
        (unix_micros(col("ts").cast("timestamp")) -
          when(col("event_id") % 53 === 0, 300L).otherwise(col("event_id") % 7)
            * 60000000L).as("ets_us"),
        floor(col("event_id") / 50).cast("long").as("batch"))
      val batchMax = ev.groupBy(col("batch")).agg(max(col("ets_us")).as("bmax"))
      // the batch table is O(#micro-batches) — a single-partition window
      // here is over hundreds of rows, not the event stream
      val wWm = org.apache.spark.sql.expressions.Window
        .orderBy(col("batch"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val batchWm = batchMax
        .withColumn("wm_us", max(col("bmax")).over(wWm) - 600000000L)
        .select(col("batch"), col("wm_us"))
      val fin = batchMax.agg((max(col("bmax")) - 600000000L).as("fwm"))
      val ok = ev.join(broadcast(batchWm), Seq("batch"))
        .filter(col("wm_us").isNull || col("ets_us") >= col("wm_us"))
      ok.groupBy((col("ets_us") - pmod(col("ets_us"), lit(3600000000L))).as("w_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
            .cast("double").as("sum_value"))
        .crossJoin(broadcast(fin))
        .filter(col("w_us") + 3600000000L <= col("fwm"))
        .select(
          date_format(timestamp_micros(col("w_us")), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("wstart"), col("event_type"))
    },

    // ST5/ST6: stateful job registry over a synthetic event-bus replay.
    // Registered with suppression threshold 0 (every event emits), which
    // makes the aggregate of the emitted stream pure SQL: n_updates =
    // event count, max_progress = max progress seen, n_recent_logs =
    // ring-buffer size = min(50, LOG count). The emit-dependent
    // 5%-suppression variant is NOT SQL-expressible and stays covered by
    // StreamingSpec (suppression + cross-batch state + retention TTL).
    "q36_job_registry" -> QueryDef(
      """WITH ev AS (
        |  SELECT 'job_' || (user_id % 50) AS jobId,
        |         CASE event_type WHEN 'click' THEN 'STATUS'
        |              WHEN 'view' THEN 'PROGRESS' ELSE 'LOG' END AS eventType,
        |         CASE WHEN event_type = 'view'
        |              THEN CAST(trunc(value % 101) AS INT) END AS progress
        |  FROM events)
        |SELECT jobId,
        |       count(*) AS n_updates,
        |       coalesce(max(CASE WHEN eventType = 'PROGRESS' THEN progress END), 0) AS max_progress,
        |       CAST(least(50, count(CASE WHEN eventType = 'LOG' THEN 1 END)) AS BIGINT) AS n_recent_logs
        |FROM ev GROUP BY jobId ORDER BY jobId""".stripMargin) { (s, dir) =>
      import s.implicits._
      val events = Tables(s, dir).events.select(
        concat(lit("job_"), col("user_id") % 50).as("jobId"),
        when(col("event_type") === "click", "STATUS")
          .when(col("event_type") === "view", "PROGRESS")
          .otherwise("LOG").as("eventType"),
        when(col("event_type") === "click",
          element_at(array(lit("PENDING"), lit("RUNNING"), lit("COMPLETED")),
            (col("event_id") % 3 + 1).cast("int"))).as("status"),
        when(col("event_type") === "view",
          (col("value") % 101).cast("int")).as("progress"),
        lit(null).cast("string").as("currentStep"),
        when(!col("event_type").isin("click", "view"), col("props")).as("logLine"),
        col("ts"))
        .as[JobRegistry.JobEvent]
      JobRegistry.registry(events, threshold = 0).toDF()
        .groupBy(col("jobId"))
        .agg(count(lit(1)).as("n_updates"),
          max(col("progressPercent")).as("max_progress"),
          max(size(col("recentLogs"))).cast("long").as("n_recent_logs"))
        .orderBy(col("jobId"))
    }
  )
}
