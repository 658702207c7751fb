package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Persisted dimension CHANGE FEED backing streaming SCD2 maintenance
  * ([[graft.streaming.Scd2Ingest]]): append-only (key, attr, ts_us,
  * seq) change rows under the delta-granular [[DeltaStore]] protocol —
  * batch-id-keyed deltas make replays overwrite their own delta
  * (exactly-once by construction), compaction folds history, and the
  * `base.old` fallback covers a mid-compaction crash.
  *
  * The STORE is the feed, not the dimension: SCD2 intervals are
  * DERIVED at serve time by one key-partitioned window pass
  * ([[graft.operators.Scd2.history]] over [[load]]) — the
  * ingest-appends / serve-derives shape the index and moment stores
  * established (a materialized interval table would need its open rows
  * rewritten per batch; the feed is immutable). `strictCommit`: a
  * partially visible delta would serve a SUBSET of a batch's changes
  * and close intervals at wrong instants, so only `_SUCCESS`-marked
  * deltas serve — the PostingsStore exposure class, not
  * FingerprintStore's under-suppression. */
object ChangeFeedStore {

  private val store = new DeltaStore(
    StructType(Seq(
      StructField("k", LongType),
      StructField("attr", StringType),
      StructField("ts_us", LongType),
      StructField("seq", LongType))),
    dedupe = false,
    layoutCols = Seq("k"),
    strictCommit = true)

  /** Append one micro-batch's changes as the batch's own delta.
    * `batchId` must be the caller's deterministic run identifier. */
  def appendDelta(rows: DataFrame, dir: String, batchId: String): Unit =
    store.appendDelta(rows, dir, batchId)

  /** The full feed: base generation ∪ committed deltas. */
  def load(spark: SparkSession, dir: String): DataFrame =
    store.load(spark, dir, excludeDelta = None)

  /** The feed AS OF a batch id (ordered ids required) — time-travel
    * serving: the dimension "as the warehouse knew it" after that
    * ingestion run. */
  def loadAsOf(spark: SparkSession, dir: String,
      upToBatch: String): DataFrame =
    store.loadAsOf(spark, dir, upToBatch)

  /** Fold deltas into the base generation. */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 8): Int =
    store.compact(spark, dir, numFiles)
}
