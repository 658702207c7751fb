package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Persisted perceptual-hash store for run-over-run incremental IMAGE
  * near-dup admission — the image analog of [[FingerprintStore]]
  * (exact text) and [[MinHashStore]] (near text): each ingestion run
  * checks its batch's dHashes against the store
  * (`Dedup.incrementalHammingPairs`) and appends the ADMITTED hashes
  * as a delta.
  *
  * Rows are (id, hash) — 16 bytes — so the delta-granular
  * [[DeltaStore]] protocol fits (batch-id-keyed deltas = exactly-once
  * under replay; periodic compaction folds history; `base.old`
  * fallback mid-crash). MinHashStore's generation-rewrite layout
  * exists because signature rows are heavy; hash rows are not. */
object DHashStore {

  // shared with AudioHashStore: a DeltaStore instance is a stateless
  // layout config (all state lives under the caller's dir), and the
  // (id, hash) perceptual-fingerprint layout is identical across the
  // image and audio modalities — one config, two named store fronts
  private[sources] val store = new DeltaStore(
    StructType(Seq(
      StructField("id", LongType),
      StructField("hash", LongType))),
    dedupe = true,
    layoutCols = Seq("id"))

  /** Append one run's admitted hashes as the batch's own delta.
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
