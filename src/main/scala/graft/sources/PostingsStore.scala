package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Persisted inverted index for run-over-run corpus ingestion — the
  * retrieval-side sibling of [[FingerprintStore]], on the same
  * [[DeltaStore]] base+delta protocol. Each ingestion run tokenizes and
  * aggregates ONLY its own batch (`Retrieval.postings` over the new
  * docs) and appends the result as a delta; the historical corpus is
  * never re-tokenized. Compaction folds generations into a term-hash
  * layout, so the probe-side broadcast join reads uniformly-spread
  * files at any index size.
  *
  * Row shape: (doc_id, term, tf, dl) — dl is the document's total token
  * count, computed WITHIN the batch that owns the doc (docs must not
  * span batches; each doc_id appears in exactly one delta, so no
  * cross-generation merge arithmetic is ever needed and compaction
  * needs no dedupe). Corpus stats for BM25 weighting
  * (`Retrieval.storeStats`) re-derive from the loaded union, so
  * df/avgdl/N always reflect EXACTLY the docs the index holds — the
  * incremental path is score-identical to a monolithic rebuild (q157's
  * oracle equality).
  *
  * `strictCommit = true`: a doc's term rows live in ONE delta, so a
  * committer crash mid-append must not let the partial delta serve (it
  * would hold a SUBSET of the doc's rows — wrong df and scores until
  * the batch replays). Only `_SUCCESS`-marked deltas are visible; the
  * FingerprintStore "under-suppression only" argument does not
  * transfer here. */
object PostingsStore {

  private val store = new DeltaStore(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("term", StringType),
      StructField("tf", LongType),
      StructField("dl", LongType))),
    dedupe = false,
    layoutCols = Seq("term"),
    strictCommit = true)

  /** Append one ingestion batch's postings (the `Retrieval.postings`
    * of the NEW docs only). `batchId` must be deterministic per run. */
  def appendDelta(batchPostings: DataFrame, dir: String,
      batchId: String): Unit =
    store.appendDelta(batchPostings, dir, batchId)

  /** The full index: base generation ∪ committed deltas. */
  def load(spark: SparkSession, dir: String): DataFrame =
    store.load(spark, dir, excludeDelta = None)

  /** The index AS OF a batch id — time travel at delta granularity
    * (ordered batch ids required); reads before the compaction fold
    * point fail loudly. See DeltaStore.loadAsOf. */
  def loadAsOf(spark: SparkSession, dir: String,
      upToBatch: String): DataFrame =
    store.loadAsOf(spark, dir, upToBatch)

  /** [[load]] minus one delta — the replay-safety hook for re-running
    * a crashed batch (see FingerprintStore.load). */
  def load(spark: SparkSession, dir: String,
      excludeDelta: Option[String]): DataFrame =
    store.load(spark, dir, excludeDelta)

  /** Fold into a term-hash base generation. */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 32): Int =
    store.compact(spark, dir, numFiles)
}
