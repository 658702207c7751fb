package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * Every query takes `(spark, sfDir)` and reads through here so that the
  * same code runs at any scale factor — and, on a real cluster, against a
  * directory of many parquet files rather than a single local file.
  * Column pruning and predicate pushdown reach the scan automatically
  * because these are plain parquet reads with no eager actions.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `ts` is TIMESTAMP(NANOS) in the parquet; Spark reads it as Long nanos
    * (spark.sql.legacy.parquet.nanosAsLong). Convert to micro-precision
    * TimestampType — same truncation DuckDB-vs-Spark-safe queries assume. */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
