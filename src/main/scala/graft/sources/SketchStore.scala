package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Persisted count-min cell store backing
  * [[graft.streaming.SketchIngest]]: (hrow, bucket, cnt) cells under
  * the delta-granular [[DeltaStore]] protocol. Readers SUM cells, so
  * compaction's only job is folding delta files — the store never
  * exceeds batches × depth × width rows and collapses to depth × width.
  * `strictCommit`: a half-visible delta would under-count a batch's
  * keys and break the estimator's never-undercount guarantee — the
  * exposure class that demands marker-gated serving. */
object SketchStore {

  private val store = new DeltaStore(
    StructType(Seq(
      StructField("hrow", IntegerType),
      StructField("bucket", LongType),
      StructField("cnt", LongType))),
    dedupe = false,
    layoutCols = Seq("hrow", "bucket"),
    strictCommit = true)

  def appendDelta(rows: DataFrame, dir: String, batchId: String): Unit =
    store.appendDelta(rows, dir, batchId)

  def load(spark: SparkSession, dir: String): DataFrame =
    store.load(spark, dir, excludeDelta = None)

  def compact(spark: SparkSession, dir: String, numFiles: Int = 2): Int =
    store.compact(spark, dir, numFiles)
}
