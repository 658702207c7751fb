package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Persisted frame-hash POSTING store for run-over-run incremental
  * VIDEO near-dup admission — one level up from [[DHashStore]] (one
  * hash per image): an entity here is a SET of frame hashes, stored as
  * (id, fhash) posting rows, checked via
  * `Dedup.incrementalFrameSetPairs` and appended per admission run.
  *
  * Rows are 16 bytes and bounded per entity by the frame-sample cap,
  * so the delta-granular [[DeltaStore]] protocol fits unchanged:
  * batch-id-keyed deltas = exactly-once under replay, periodic
  * compaction folds history, `base.old` fallback mid-crash.
  *
  * `strictCommit = true` because an entity spans MULTIPLE rows: a
  * half-visible delta would serve a truncated frame set, and a
  * truncated set skews every Jaccard computed against it — a true
  * near-dup could then score under threshold and be wrongly admitted
  * for good. (DHashStore can afford non-strict because its entities
  * are single rows.) */
object FrameHashStore {

  private val store = new DeltaStore(
    StructType(Seq(
      StructField("id", LongType),
      StructField("fhash", LongType))),
    dedupe = true,
    layoutCols = Seq("id"),
    strictCommit = true)

  /** Append one run's admitted postings as the batch's own delta. */
  def appendDelta(rows: DataFrame, dir: String, batchId: String): Unit =
    store.appendDelta(rows, dir, batchId)

  /** The full store: base generation ∪ committed deltas. */
  def load(spark: SparkSession, dir: String): DataFrame =
    store.load(spark, dir, excludeDelta = None)

  /** The store WITHOUT one batch's own delta — the read an admission
    * replay must use. */
  def loadExcluding(spark: SparkSession, dir: String,
      batchId: String): DataFrame =
    store.load(spark, dir, excludeDelta = Some(batchId))

  /** The store AS OF a batch id (ordered ids required). */
  def loadAsOf(spark: SparkSession, dir: String,
      upToBatch: String): DataFrame =
    store.loadAsOf(spark, dir, upToBatch)

  /** Fold deltas into the base generation. */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 8): Int =
    store.compact(spark, dir, numFiles)
}
