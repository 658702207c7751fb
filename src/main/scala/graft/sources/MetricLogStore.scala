package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/** Persisted data-quality metric log backing
  * [[graft.streaming.QualityMonitor]]: (batch_seq, check_id,
  * metric_milli, passed) rows under the delta-granular [[DeltaStore]]
  * protocol — batch-id-keyed deltas (replays overwrite their own
  * rows), compaction folds history. Suite-sized rows per batch, so the
  * log is kilobytes at any corpus scale; `strictCommit` because a
  * half-visible batch of metrics would read as a suite that silently
  * skipped checks. */
object MetricLogStore {

  private val store = new DeltaStore(
    StructType(Seq(
      StructField("batch_seq", LongType),
      StructField("check_id", StringType),
      StructField("metric_milli", LongType),
      StructField("passed", BooleanType))),
    dedupe = false,
    layoutCols = Seq("check_id"),
    strictCommit = true)

  def appendDelta(rows: DataFrame, dir: String, batchId: String): Unit =
    store.appendDelta(rows, dir, batchId)

  def load(spark: SparkSession, dir: String): DataFrame =
    store.load(spark, dir, excludeDelta = None)

  def compact(spark: SparkSession, dir: String, numFiles: Int = 4): Int =
    store.compact(spark, dir, numFiles)
}
