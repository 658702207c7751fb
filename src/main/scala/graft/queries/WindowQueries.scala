package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Event-time window aggregations beyond the reference surface (the
  * reference is processing-time only — SURVEY ST8): sliding windows as
  * used by metrics dashboards over the event stream. Batch-mode here
  * (same operator works under readStream + watermark; see
  * StreamingSpec's watermark test).
  */
object WindowQueries {

  val entries: Map[String, QueryDef] = Map(

    // Sliding window (10 min window, 5 min slide): each event lands in 2
    // windows. DuckDB re-derives the window set by unioning the two
    // candidate slide-aligned starts per event.
    "q42_sliding_window" -> QueryDef(
      """WITH e AS (
        |  SELECT event_type, value, ts,
        |         make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300) * 1000000) AS slide0
        |  FROM events),
        |expanded AS (
        |  SELECT event_type, value, slide0 AS win_start FROM e
        |  WHERE ts >= slide0 AND ts < slide0 + to_seconds(600)
        |  UNION ALL
        |  SELECT event_type, value, slide0 - to_seconds(300) AS win_start FROM e
        |  WHERE ts >= slide0 - to_seconds(300)
        |    AND ts < slide0 - to_seconds(300) + to_seconds(600))
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
        |FROM expanded
        |GROUP BY win_start, event_type
        |ORDER BY window_start, event_type
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
            .cast("double").as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
        .limit(5000)
    },

    // ROLLUP hierarchy totals (beyond the reference surface — it has no
    // grouping sets; a complete analytics engine needs them).
    "q43_rollup" -> QueryDef(
      """SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
        |       COALESCE(l_linestatus, '<all>') AS linestatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
            .cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))
    }
  )
}
