package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming data-quality monitoring: evaluate a
  * [[graft.operators.QualityChecks]] suite on every micro-batch and
  * append the (batch_id, check_id, metric_milli, passed) rows to a
  * persisted metric log — the "is tonight's feed shaped like last
  * week's" control loop every production pipeline runs beside its
  * loads. Batch-id-keyed deltas make replays overwrite their own rows
  * (exactly-once by construction, the store fleet convention).
  *
  * [[drift]] reads the log and flags, per check, a latest metric that
  * moved more than `tolMilli` permille (relative) away from the MEDIAN
  * of its trailing window — median, not mean, for the same robustness
  * reason the corpus outlier rollups use MAD: one bad historical batch
  * must not move the baseline it is judged against. All integer
  * arithmetic (|latest − med| · 1000 > tolMilli · max(med, 1)).
  *
  * Scale shape: the per-batch cost is the suite's one aggregation pass
  * over the batch (+ per-FK anti-join); the log grows by suite-size
  * rows per batch — kilobytes — and drift evaluation windows over
  * check_id partitions of that tiny log. */
object QualityMonitor {

  private val LogSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("batch_seq",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("check_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("metric_milli",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("passed",
      org.apache.spark.sql.types.BooleanType)))

  /** foreachBatch sink: run the suite on each micro-batch, log the
    * metrics. Wire as
    * `.writeStream.foreachBatch(QualityMonitor.metricsSink(dir, checks))`. */
  def metricsSink(dir: String,
      checks: Seq[graft.operators.QualityChecks.Check])
      : (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) =>
      ingest(batch.toDF(), dir, batchId, checks)

  /** One monitoring step: suite over the batch, rows appended as the
    * batch's own delta (replays overwrite it). Empty batches still log
    * — a feed that went silent is itself a quality signal
    * (row_count checks fail loudly instead of not being evaluated). */
  def ingest(batch: DataFrame, dir: String, batchSeq: Long,
      checks: Seq[graft.operators.QualityChecks.Check]): Unit = {
    val metrics = graft.operators.QualityChecks.run(batch, checks)
      .withColumn("batch_seq", lit(batchSeq))
      .select("batch_seq", "check_id", "metric_milli", "passed")
    graft.sources.MetricLogStore.appendDelta(metrics, dir,
      f"b$batchSeq%09d")
  }

  /** The full metric log. */
  def history(spark: SparkSession, dir: String): DataFrame =
    graft.sources.MetricLogStore.load(spark, dir)

  /** Per-check drift verdicts over the trailing window: for each
    * check_id, (latest batch_seq, latest metric, trailing median of
    * the `window` prior batches, drifted). Checks with no prior
    * history never flag (no baseline to drift from). */
  def drift(spark: SparkSession, dir: String, window: Int = 8,
      tolMilli: Long = 100L): DataFrame = {
    require(window >= 1, s"window must be at least 1, got $window")
    val log = history(spark, dir)
    val latest = log.groupBy(col("check_id"))
      .agg(max(col("batch_seq")).as("batch_seq"))
      .join(log, Seq("check_id", "batch_seq"))
      .select(col("check_id"), col("batch_seq"),
        col("metric_milli").as("latest_milli"))
    val prior = log.join(latest.select(col("check_id"),
        col("batch_seq").as("__latest")), Seq("check_id"))
      .filter(col("batch_seq") < col("__latest") &&
        col("batch_seq") >= col("__latest") - window)
      .groupBy(col("check_id"))
      // exact integer median: percentile() is exact in Spark; floor to
      // the integer grid so the comparison below stays integral
      .agg(expr("CAST(percentile(metric_milli, 0.5) AS BIGINT)")
        .as("median_milli"))
    latest.join(prior, Seq("check_id"), "left")
      .withColumn("drifted",
        col("median_milli").isNotNull &&
          abs(col("latest_milli") - col("median_milli")) * 1000L >
            lit(tolMilli) * greatest(col("median_milli"), lit(1L)))
      .select(col("check_id"), col("batch_seq"), col("latest_milli"),
        col("median_milli"), col("drifted"))
  }
}
