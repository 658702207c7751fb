package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, QueryDef, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * pipeline extensions) registers one [[graft.core.QueryDef]] in a module
  * under `graft.queries`; this object is just the aggregation point.
  */
object SparkEntry {

  private def modules: Seq[Map[String, QueryDef]] = Seq(
    graft.queries.Relational.entries,
    graft.queries.RuleQueries.entries,
    graft.queries.MetricsQueries.entries,
    graft.queries.PipelineQueries.entries,
    graft.queries.StreamingQueries.entries,
    graft.queries.MultimodalQueries.entries,
    graft.queries.StringQueries.entries,
    graft.queries.AuthQueries.entries,
    graft.queries.LogSourceQueries.entries,
    graft.queries.ConfigQueries.entries,
    graft.queries.ExtensionQueries.entries,
    graft.queries.JsonQueries.entries,
    graft.queries.WindowQueries.entries,
    graft.queries.CorpusQueries.entries,
    graft.queries.LmQueries.entries
  )

  lazy val all: Map[String, QueryDef] = modules.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship pipeline is GET /api/monitor/jobs —
    * filter → filter → limit → derived projection
    * (reference: src/request_handler.cpp:1172-1318). */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val dir = "/root/testdata/sf0.001"
    // the real flagship path: orders → jobs frame → param-compiled
    // filter/sort/limit/derive pipeline → reference JSON rows
    val jobs = Tables(spark, dir).orders.select(
      concat(lit("job_"), col("o_orderkey")).as("jobId"),
      when(col("o_orderstatus") === "O", "RUNNING")
        .when(col("o_orderstatus") === "F", "COMPLETED")
        .otherwise("PENDING").as("status"),
      lit("FULL_ETL").as("jobType"),
      col("o_orderdate").cast("timestamp").as("createdAt"),
      col("o_orderdate").cast("timestamp").as("startedAt"),
      timestamp_millis(unix_millis(col("o_orderdate").cast("timestamp")) + 60000L)
        .as("completedAt"),
      (col("o_orderkey") % 1000).as("recordsProcessed"),
      (col("o_orderkey") % 900).as("recordsSuccessful"),
      (col("o_orderkey") % 7).as("recordsFailed"),
      lit(null).cast("string").as("errorMessage"))
    graft.api.QueryApi.monitorJobs(jobs, "status=COMPLETED&limit=100")
      .fold(err => sys.error(err), identity)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) =>
      name -> { (s: SparkSession, dir: String) =>
        GraftSession.tune(s)
        q.fn(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, QueryDef(_, Some(sql), _)) => name -> sql }
}
