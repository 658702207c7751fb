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
    },

    // SCD2 dimension versioning over the events feed (user_id ->
    // event_type as the tracked attribute): validity intervals
    // [valid_from, valid_to) with no-op changes collapsed, open row per
    // key. The ENGINE runs the INCREMENTAL path — history over the
    // first 15 days, then Scd2.merge of the remainder — while the
    // oracle derives the full history in one window pass: a hash match
    // IS the fold law merge(history(early), late) == history(all),
    // pinned cross-engine (Scd2Spec pins it at more split points).
    // Timestamps compare as exact epoch micros (the q63 discipline).
    "q211_scd2_merge" -> QueryDef(
      """WITH c AS (SELECT user_id, event_type AS attr, epoch_us(ts) AS ts_us,
        |             event_id AS seq FROM events),
        |o AS (SELECT *, lag(attr) OVER
        |        (PARTITION BY user_id ORDER BY ts_us, seq) AS prev FROM c),
        |d AS (SELECT * FROM o WHERE prev IS NULL OR prev <> attr),
        |v AS (SELECT user_id, attr, ts_us AS vf, seq,
        |        lead(ts_us) OVER
        |          (PARTITION BY user_id ORDER BY ts_us, seq) AS vt
        |      FROM d)
        |SELECT CAST(user_id AS BIGINT) AS user_id, attr,
        |       CAST(vf AS BIGINT) AS valid_from_us,
        |       CAST(vt AS BIGINT) AS valid_to_us,
        |       CAST(seq AS BIGINT) AS seq,
        |       (vt IS NULL) AS is_current
        |FROM v ORDER BY user_id, valid_from_us, seq""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events.select(
        col("user_id").cast("long").as("user_id"),
        col("event_type").as("attr"),
        col("ts"), col("event_id").cast("long").as("seq"))
      val splitUs = ev.agg(min(unix_micros(col("ts").cast("timestamp"))).as("m"))
        .first().getLong(0) + 15L * 86400L * 1000000L
      val early = ev.filter(unix_micros(col("ts").cast("timestamp")) <= splitUs)
      val late = ev.filter(unix_micros(col("ts").cast("timestamp")) > splitUs)
      val init = graft.operators.Scd2.history(early, "user_id",
        Seq("attr"), "ts", "seq")
      graft.operators.Scd2.merge(init, late, "user_id", Seq("attr"),
        "ts", "seq")
        .select(col("user_id"), col("attr"),
          unix_micros(col("valid_from").cast("timestamp")).as("valid_from_us"),
          unix_micros(col("valid_to").cast("timestamp")).as("valid_to_us"),
          col("seq"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from_us"), col("seq"))
    },

    // SCD2 temporal lookup (the star-schema as-of enrichment the q211
    // dimension exists FOR): every view event picks up the purchase
    // tier in force for its user at event time — LEFT join, so views
    // before the first purchase keep NULL (a miss is information).
    // Interval uniqueness makes the join multiplication-free by
    // construction (Scd2Spec pins it); both sides shuffle on user_id
    // with shuffle_hash pinned. Time compared as exact epoch micros.
    "q216_scd2_lookup" -> QueryDef(
      """WITH p AS (SELECT user_id, CAST(floor(value / 50) AS BIGINT) AS tier,
        |      epoch_us(ts) AS ts_us, event_id AS seq
        |    FROM events WHERE event_type = 'purchase'),
        |o AS (SELECT *, lag(tier) OVER
        |        (PARTITION BY user_id ORDER BY ts_us, seq) AS prev FROM p),
        |d AS (SELECT * FROM o WHERE prev IS NULL OR prev <> tier),
        |v AS (SELECT user_id, tier, ts_us AS vf, seq,
        |        lead(ts_us) OVER
        |          (PARTITION BY user_id ORDER BY ts_us, seq) AS vt
        |      FROM d),
        |f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'view')
        |SELECT CAST(f.event_id AS BIGINT) AS event_id,
        |  CAST(f.user_id AS BIGINT) AS user_id,
        |  v.tier, CAST(v.seq AS BIGINT) AS version_seq
        |FROM f LEFT JOIN v ON f.user_id = v.user_id
        |  AND f.ts_us >= v.vf AND (v.vt IS NULL OR f.ts_us < v.vt)
        |ORDER BY f.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").cast("long").as("user_id"),
          expr("CAST(floor(value / 50) AS BIGINT)").as("tier"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          col("event_id").cast("long").as("seq"))
      val dim = graft.operators.Scd2.history(purchases, "user_id",
        Seq("tier"), "ts_us", "seq")
      val facts = ev.filter(col("event_type") === "view")
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      graft.operators.Scd2.lookupAsOf(facts, dim, "user_id", "ts_us")
        .select(col("event_id"), col("user_id"),
          col("__scd_attrs").getField("tier").as("tier"),
          col("version_seq"))
        .orderBy(col("event_id"))
    }
  )
}
