package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.core.{QueryDef, Tables}

/** Batch relational operators from SURVEY.md §2.2/§2.5/§2.6/§2.7/§2.8,
  * expressed over the driver's TPC-H-ish tables so the DuckDB oracle can
  * verify them (orders stands in for the etl_jobs control-plane table:
  * o_orderstatus≈status, o_orderpriority≈job_type, o_orderdate≈created_at).
  *
  * Scale notes: every query is a single declarative plan — filters and
  * projections reach the parquet scan via Catalyst pushdown; aggregations
  * are partial (map-side) before the shuffle; dimension joins broadcast.
  */
object Relational {

  /** Exact decimal sum of a double expression, returned as double —
    * identical across engines regardless of row/partition order. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  private def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(28, scale))).cast("double") / count(c))

  private def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  val entries: Map[String, QueryDef] = Map(

    // P1/P5/O1: status filter + deterministic sort + limit
    // (reference: src/request_handler.cpp:1201-1211, 1252-1268;
    //  src/etl_job_repository.cpp:149).
    "q01_filter_status" -> QueryDef(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), fmtDate(col("o_orderdate")).as("order_date"))
        .orderBy(col("o_orderkey"))
        .limit(500)
    },

    // P3/P4: time-range + IN-list filters
    // (reference: src/request_handler.cpp:1226-1249; src/etl_job_repository.cpp:350).
    "q02_filter_time_in" -> QueryDef(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_returnflag, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_returnflag IN ('R', 'A')
        |ORDER BY l_orderkey, l_linenumber LIMIT 1000""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_returnflag").isin("R", "A"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"),
          fmtDate(col("l_shipdate")).as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(1000)
    },

    // O1/O2: ORDER BY created_at DESC + limit → TakeOrderedAndProject
    // (reference: src/etl_job_repository.cpp:149; src/request_handler.cpp:1252-1268).
    "q03_top_recent" -> QueryDef(
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       o_orderpriority, o_totalprice
        |FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 100""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), fmtDate(col("o_orderdate")).as("order_date"),
          col("o_orderpriority"), col("o_totalprice"))
        .limit(100)
    },

    // P6: projection + derived columns (executionTimeMs / processingRate /
    // successRate analogs) (reference: src/request_handler.cpp:934-965, 1273-1315).
    "q04_derived_projection" -> QueryDef(
      """SELECT o_orderkey, o_orderstatus,
        |       o_totalprice * 1.1 AS gross_price,
        |       CASE WHEN o_orderstatus = 'O'
        |            THEN NULL ELSE o_totalprice END AS settled_price,
        |       o_totalprice / 100.0 AS price_rate
        |FROM orders
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") * lit(1.1)).as("gross_price"),
          when(col("o_orderstatus") === "O", lit(null))
            .otherwise(col("o_totalprice")).as("settled_price"),
          (col("o_totalprice") / lit(100.0)).as("price_rate"))
        .orderBy(col("o_orderkey"))
        .limit(1000)
    },

    // A1: composite aggregation — SUMs, MAXes, conditional AVG, derived
    // ratios (reference: src/job_monitor_service.cpp:1292-1385).
    "q05_agg_composite" -> QueryDef(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_revenue,
        |       MAX(l_discount) AS max_discount,
        |       CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_discount END AS DECIMAL(28,2))) AS DOUBLE)
        |         / COUNT(CASE WHEN l_discount > 0.05 THEN l_discount END) AS avg_big_discount,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val bigDisc = when(col("l_discount") > 0.05, col("l_discount"))
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_revenue"),
          max(col("l_discount")).as("max_discount"),
          (dsum(bigDisc) / count(bigDisc)).as("avg_big_discount"),
          count(lit(1)).as("n_rows"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // A3: aggregate grouped by type (reference: src/job_monitor_service.cpp:491-512).
    "q06_agg_by_type" -> QueryDef(
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price,
        |       MAX(o_totalprice) AS max_price,
        |       MIN(o_totalprice) AS min_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy(col("o_orderpriority"))
    },

    // A4: aggregate over a time range (reference: src/job_monitor_service.cpp:514-538).
    "q07_agg_time_range" -> QueryDef(
      """SELECT COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |       MAX(l_extendedprice) AS max_price,
        |       COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-09-01 00:00:00'""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"),
          max(col("l_extendedprice")).as("max_price"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    },

    // A5/A6: conditional AVG with empty→0.0 fallback
    // (reference: src/job_monitor_service.cpp:540-606).
    "q08_avg_conditional" -> QueryDef(
      """SELECT o_orderstatus,
        |       COALESCE(CAST(SUM(CAST(CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS DECIMAL(28,2))) AS DOUBLE)
        |                 / NULLIF(COUNT(CASE WHEN o_totalprice > 200000 THEN o_totalprice END), 0), 0.0) AS avg_big,
        |       COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val big = when(col("o_totalprice") > 200000, col("o_totalprice"))
      Tables(s, dir).orders
        .groupBy(col("o_orderstatus"))
        .agg(coalesce(dsum(big) / nullif(count(big), lit(0)), lit(0.0)).as("avg_big"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    // A7: min/max performance benchmarks — elementwise best/worst
    // (reference: src/job_monitor_service.cpp:608-665).
    "q09_minmax_bench" -> QueryDef(
      """SELECT
        |  MIN(CASE WHEN l_quantity > 0 THEN l_quantity END) AS min_pos_qty,
        |  MAX(l_quantity) AS max_qty,
        |  MIN(CASE WHEN l_discount > 0 THEN l_discount END) AS min_pos_discount,
        |  MAX(l_discount) AS max_discount,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem.agg(
        min(when(col("l_quantity") > 0, col("l_quantity"))).as("min_pos_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(when(col("l_discount") > 0, col("l_discount"))).as("min_pos_discount"),
        max(col("l_discount")).as("max_discount"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
    },

    // A12: job status counts (reference: src/request_handler.cpp:1350-1352 declared shape).
    "q10_status_counts" -> QueryDef(
      """SELECT o_orderstatus AS status, COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables(s, dir).orders
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status"))
    },

    // J1: FK equi-join fact⋈fact + aggregation
    // (reference: src/database_schema.cpp:70 job_monitoring→etl_jobs FK).
    "q11_join_fk" -> QueryDef(
      """SELECT o.o_orderpriority,
        |       COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderstatus <> 'P'
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderstatus") =!= "P")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    // J3: dimension chain join (session→user analog), dims broadcast
    // (reference: src/session_repository.cpp:46-70 + src/user_repository.cpp:74-97).
    "q12_join_dim_chain" -> QueryDef(
      """SELECT r.r_name AS region, n.n_name AS nation,
        |       COUNT(*) AS n_customers,
        |       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("region"), col("nation"))
    },

    // O5: union of active+completed sets feeding an aggregation
    // (reference: src/job_monitor_service.cpp:495-509).
    "q13_union_sets" -> QueryDef(
      """SELECT src, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
        |FROM (
        |  SELECT 'active' AS src, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT 'done' AS src, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY src ORDER BY src""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
      val active = o.filter(col("o_orderstatus") === "O")
        .select(lit("active").as("src"), col("o_totalprice"))
      val done = o.filter(col("o_orderstatus") === "F")
        .select(lit("done").as("src"), col("o_totalprice"))
      active.unionByName(done)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("src"))
    },

    // A9: per-key top-N by time via row_number window
    // (reference: src/job_monitor_service.cpp:667-686 history cap).
    "q14_window_topn" -> QueryDef(
      """SELECT l_orderkey, l_linenumber, rn FROM (
        |  SELECT l_orderkey, l_linenumber,
        |         ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_shipdate DESC, l_linenumber ASC) AS rn
        |  FROM lineitem)
        |WHERE rn <= 2
        |ORDER BY l_orderkey, rn LIMIT 2000""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_shipdate").desc, col("l_linenumber").asc)
      Tables(s, dir).lineitem
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
        .orderBy(col("l_orderkey"), col("rn"))
        .limit(2000)
    },

    // Processing-rate delta via LAG (reference: include/system_metrics.hpp:171-172).
    "q15_window_lag" -> QueryDef(
      """SELECT user_id, event_id,
        |       value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
        |FROM events
        |ORDER BY user_id, event_id LIMIT 2000""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy(col("user_id"), col("event_id"))
        .limit(2000)
    },

    // Peak tracking: running MAX (reference: include/system_metrics.hpp:73-74).
    "q16_running_peak" -> QueryDef(
      """SELECT user_id, event_id,
        |       MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |FROM events
        |ORDER BY user_id, event_id LIMIT 2000""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          max(col("value")).over(w).as("peak"))
        .orderBy(col("user_id"), col("event_id"))
        .limit(2000)
    },

    // ST4 batch analog: fixed-window rate limiting — per (client, minute)
    // counts + over-limit flag (reference: src/rate_limiter.cpp:48-88, 206-215).
    "q17_rate_windows" -> QueryDef(
      """SELECT user_id, event_type,
        |       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       COUNT(*) AS n,
        |       CASE WHEN COUNT(*) > 3 THEN TRUE ELSE FALSE END AS over_limit
        |FROM events
        |GROUP BY user_id, event_type, date_trunc('minute', ts)
        |ORDER BY user_id, event_type, window_start LIMIT 5000""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .groupBy(col("user_id"), col("event_type"),
          date_trunc("minute", col("ts")).as("ws"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("event_type"),
          date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("n"), (col("n") > 3).as("over_limit"))
        .orderBy(col("user_id"), col("event_type"), col("window_start"))
        .limit(5000)
    },

    // O6/DISTINCT: set-dedup projection (reference dedups jobId lists,
    // src/job_monitoring_models.cpp:861-865; DISTINCT is its SQL form).
    "q45_distinct" -> QueryDef(
      """SELECT DISTINCT user_id, event_type
        |FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir).events
        .select(col("user_id"), col("event_type"))
        .distinct()
        .orderBy(col("user_id"), col("event_type"))
    },

    // P9 declared log-query semantics: text+regex filter, multi-key sort,
    // offset pagination (reference: include/log_file_manager.hpp:45-61).
    "q18_log_query" -> QueryDef(
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE text LIKE '%window%' AND regexp_matches(text, 'scan (merge|join)')
        |ORDER BY n_chars DESC, doc_id ASC
        |LIMIT 50 OFFSET 10""".stripMargin) { (s, dir) =>
      Tables(s, dir).documents
        .filter(col("text").contains("window") &&
          col("text").rlike("scan (merge|join)"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .offset(10)
        .limit(50)
    },

    // Table-level data-quality constraint suite (the Deequ shape) over
    // lineitem: one aggregation pass computes completeness, uniqueness
    // (single + composite key), range containment, and row-count
    // bounds; referential integrity is one anti-join against orders.
    // Exact integer permille metrics — the oracle recomputes metric AND
    // verdict for every check. The suite deliberately mixes passing and
    // failing checks (l_orderkey alone is NOT a key; ~20% of discounts
    // exceed 0.08).
    "q214_quality_constraints" -> QueryDef(
      """WITH m AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(l_returnflag) AS BIGINT) AS c_comment,
        |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS u_ok,
        |    CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS u_okln,
        |    CAST(sum(CASE WHEN l_quantity BETWEEN CAST(1.0 AS DOUBLE)
        |      AND CAST(50.0 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS r_qty,
        |    CAST(count(l_quantity) AS BIGINT) AS d_qty,
        |    CAST(sum(CASE WHEN l_discount BETWEEN CAST(0.0 AS DOUBLE)
        |      AND CAST(0.08 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS r_disc,
        |    CAST(count(l_discount) AS BIGINT) AS d_disc
        |  FROM lineitem),
        |fk AS (SELECT CAST(count(*) AS BIGINT) AS den,
        |    CAST(count(o.o_orderkey) AS BIGINT) AS matched
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_orderkey IS NOT NULL),
        |rows_out AS (
        |  SELECT 'completeness(l_returnflag)' AS check_id,
        |    CASE WHEN n = 0 THEN 1000 ELSE c_comment * 1000 // n END AS metric_milli,
        |    1000 AS min_m FROM m
        |  UNION ALL SELECT 'uniqueness(l_orderkey)',
        |    CASE WHEN n = 0 THEN 1000 ELSE u_ok * 1000 // n END, 1000 FROM m
        |  UNION ALL SELECT 'uniqueness(l_orderkey,l_linenumber)',
        |    CASE WHEN n = 0 THEN 1000 ELSE u_okln * 1000 // n END, 1000 FROM m
        |  UNION ALL SELECT 'in_range(l_quantity,1.0,50.0)',
        |    CASE WHEN d_qty = 0 THEN 1000 ELSE r_qty * 1000 // d_qty END, 1000 FROM m
        |  UNION ALL SELECT 'in_range(l_discount,0.0,0.08)',
        |    CASE WHEN d_disc = 0 THEN 1000 ELSE r_disc * 1000 // d_disc END, 1000 FROM m
        |  UNION ALL SELECT 'row_count(1,1000000000000)', n, NULL FROM m
        |  UNION ALL SELECT 'foreign_key(l_orderkey->orders.o_orderkey)',
        |    CASE WHEN den = 0 THEN 1000 ELSE matched * 1000 // den END, 1000 FROM fk)
        |SELECT check_id, CAST(metric_milli AS BIGINT) AS metric_milli,
        |  CASE WHEN check_id = 'row_count(1,1000000000000)'
        |    THEN metric_milli BETWEEN 1 AND 1000000000000
        |    ELSE metric_milli >= min_m END AS passed
        |FROM rows_out ORDER BY check_id""".stripMargin) { (s, dir) =>
      import graft.operators.QualityChecks._
      run(Tables(s, dir).lineitem, Seq(
        Completeness("l_returnflag"),
        Uniqueness(Seq("l_orderkey")),
        Uniqueness(Seq("l_orderkey", "l_linenumber")),
        InRange("l_quantity", 1.0, 50.0),
        InRange("l_discount", 0.0, 0.08),
        RowCountBetween(1L, 1000000000000L),
        ForeignKey("l_orderkey", "orders", Tables(s, dir).orders,
          "o_orderkey")))
    }
  )
}
