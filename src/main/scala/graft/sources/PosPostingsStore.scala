package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Persisted POSITIONAL inverted index — [[PostingsStore]]'s sibling
  * for (doc_id, term, pos) occurrence rows, on the same [[DeltaStore]]
  * base+delta protocol (crash-safe two-phase append, generation
  * compaction into a term-hash layout). Each ingestion run positions
  * ONLY its own docs (`Retrieval.posPostings` over the new batch);
  * positions are doc-relative, so rows never need cross-batch
  * arithmetic and compaction needs no dedupe — the q157 argument,
  * unchanged. Phrase/proximity retrieval served over base ∪ live
  * deltas is row-identical to a monolithic rebuild (q166's oracle
  * equality).
  *
  * `strictCommit = true` for the same reason as [[PostingsStore]]: a
  * partial delta would serve a subset of a doc's occurrence rows —
  * wrong phrase/proximity answers — so only `_SUCCESS`-marked deltas
  * are visible. */
object PosPostingsStore {

  private val store = new DeltaStore(
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("term", StringType),
      StructField("pos", LongType))),
    dedupe = false,
    layoutCols = Seq("term"),
    strictCommit = true)

  /** Append one ingestion batch's occurrence rows (the
    * `Retrieval.posPostings` of the NEW docs only). */
  def appendDelta(batchPos: DataFrame, dir: String, batchId: String): Unit =
    store.appendDelta(batchPos, dir, batchId)

  /** The full positional index: base generation ∪ committed deltas. */
  def load(spark: SparkSession, dir: String): DataFrame =
    store.load(spark, dir, excludeDelta = None)

  /** The index AS OF a batch id — see DeltaStore.loadAsOf. */
  def loadAsOf(spark: SparkSession, dir: String,
      upToBatch: String): DataFrame =
    store.loadAsOf(spark, dir, upToBatch)

  /** [[load]] minus one delta — the replay-safety hook. */
  def load(spark: SparkSession, dir: String,
      excludeDelta: Option[String]): DataFrame =
    store.load(spark, dir, excludeDelta)

  /** Fold into a term-hash base generation. */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 32): Int =
    store.compact(spark, dir, numFiles)
}
