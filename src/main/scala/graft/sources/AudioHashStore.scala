package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted acoustic-fingerprint store for run-over-run incremental
  * AUDIO near-dup admission — the audio member of the per-modality
  * store family ([[FingerprintStore]] exact text, [[MinHashStore]]
  * near text, [[DHashStore]] images, [[FrameHashStore]] video): each
  * ingestion run checks its batch's band fingerprints against the
  * store (`Dedup.incrementalHammingPairs` — the Hamming machinery is
  * hash-agnostic) and appends the ADMITTED fingerprints as a delta.
  *
  * Rows are (id, hash) — 16 bytes — so the delta-granular
  * [[DeltaStore]] protocol fits exactly as it does for [[DHashStore]];
  * the layout config IS DHashStore's (one shared stateless instance —
  * everything store-specific lives under the caller's dir): batch-id-
  * keyed deltas = exactly-once under replay, periodic compaction folds
  * history, `base.old` fallback mid-crash. */
object AudioHashStore {

  private val store = DHashStore.store

  /** Append one run's admitted fingerprints as the batch's own delta.
    * `batchId` must be the caller's deterministic run identifier so
    * replays overwrite their own delta instead of duplicating it. */
  def appendDelta(rows: DataFrame, dir: String, batchId: String): Unit =
    store.appendDelta(rows, dir, batchId)

  /** The full store: base generation ∪ committed deltas. */
  def load(spark: SparkSession, dir: String): DataFrame =
    store.load(spark, dir, excludeDelta = None)

  /** The store WITHOUT one batch's own delta — the read an admission
    * replay must use: a replayed batch re-deciding against a store
    * that already contains its own prior admissions would reject
    * everything it previously admitted. */
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
