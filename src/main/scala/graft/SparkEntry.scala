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
    graft.queries.JsonQueries.entries
  )

  lazy val all: Map[String, QueryDef] = modules.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship pipeline is GET /api/monitor/jobs —
    * filter → filter → limit → derived projection
    * (reference: src/request_handler.cpp:1172-1318). */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir).orders
      .filter(col("o_orderstatus").isin("O", "F"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"),
        round(col("o_totalprice") / lit(100.0), 3).as("price_rate"))
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
