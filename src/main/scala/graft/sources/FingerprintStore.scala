package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted fingerprint store for run-over-run incremental dedup
  * (q74's production shape; see `Dedup.incrementalDedup`): each ingestion
  * run anti-joins its batch against the store and appends the batch's
  * fingerprints as a DELTA; a periodic COMPACTION folds base + deltas
  * into one distinct, fp-repartitioned base generation so the store
  * never degrades into thousands of tiny delta files.
  *
  * Layout: `store/base/` (the last compacted generation) +
  * `store/delta/<batchId>/` (one per run since). Readers union whatever
  * exists; dedup semantics only need set membership, so duplicates
  * BETWEEN base and deltas are harmless between compactions.
  *
  * Scale/durability contract (plain parquet — same trade as
  * `JobRunner.upsertJobBucketed`): deltas are append-only and
  * crash-safe — a failed append leaves a directory with no `_SUCCESS`
  * marker, which readers SKIP (the filtering is ours, in [[load]];
  * Spark's committer writes the marker but does not filter on read).
  * Compaction is SINGLE WRITER and never holds the only copy in a
  * deletable state: it builds the new generation at `base.tmp`, retires
  * the old one to `base.old`, renames tmp→base, and only then deletes
  * `base.old` and the folded deltas. A crash at ANY step leaves either
  * `base` or `base.old` present, and [[load]] falls back to `base.old`
  * when `base` is missing — so the visible store is always a superset
  * of the truth, which is safe for dedup (we may re-drop a dup, never
  * re-admit one). The fp repartition at compaction keeps each output
  * file a disjoint hash range, so the store's anti-join side stays
  * uniformly spread at 100 TB.
  */
object FingerprintStore {

  // the machinery lives in DeltaStore (the shared base+delta protocol,
  // extracted verbatim); this object pins the fingerprint row shape:
  // single `fp` string column, dedupe on append AND compact, fp-hash
  // compaction layout
  private val store = new DeltaStore(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp",
        org.apache.spark.sql.types.StringType))),
    dedupe = true,
    layoutCols = Seq("fp"))

  /** Append one run's fingerprints as a delta. `batchId` is the caller's
    * deterministic run identifier (ingestion date, batch seq — NOT a
    * wall-clock read here, so reruns overwrite their own delta instead
    * of duplicating it). */
  def appendDelta(newFps: DataFrame, dir: String, batchId: String): Unit =
    store.appendDelta(newFps, dir, batchId)

  /** The full store: base generation ∪ all committed deltas (distinct
    * not needed for anti-join membership; compaction restores it).
    * Falls back to the retired `base.old` generation when `base` is
    * absent — the state a crash between compaction's two renames
    * leaves behind. */
  def load(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, excludeDelta = None)

  /** [[load]] with one delta left out — the replay-safety hook: a
    * re-run of batch N must gate against everything EXCEPT its own
    * crashed prior write, or it suppresses its own documents and then
    * overwrites its delta with the empty result (permanent fingerprint
    * loss). */
  def load(spark: SparkSession, dir: String,
      excludeDelta: Option[String]): DataFrame =
    store.load(spark, dir, excludeDelta)

  /** Fold base + committed deltas into a fresh distinct base generation
    * of `numFiles` hash-disjoint files, then drop what was folded.
    * Returns the number of deltas folded. Swap protocol and
    * file-precise deletion as documented on [[DeltaStore]]. */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 32): Int =
    store.compact(spark, dir, numFiles)
}
