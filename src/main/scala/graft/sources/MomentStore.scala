package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Persisted PCA moment cells for run-over-run corpus ingestion — the
  * eigen-analysis sibling of [[PostingsStore]] on the same
  * [[DeltaStore]] base+delta protocol. Each ingestion run summarizes
  * ONLY its own batch ([[graft.operators.Pca.momentCells]] — ≤
  * dim(dim+1)/2 + dim + 2 exact-integer rows) and appends it as a
  * delta; the historical corpus is never re-read. Serving re-merges
  * the cells (SUM for s2/s1/n, MAX for qmax — associative, exact), so
  * the served component is BIT-EQUAL to a monolithic rebuild over
  * everything ingested — the strongest form of the mergeable-summaries
  * law, with no estimator error term at all.
  *
  * `strictCommit = true`: a batch's cells are one consistent summary —
  * a partial delta (say s2 cells without the matching n) would skew
  * the merged scatter, so only `_SUCCESS`-marked deltas serve. */
object MomentStore {

  private val store = new DeltaStore(
    StructType(Seq(
      StructField("kind", StringType),
      StructField("i", IntegerType),
      StructField("j", IntegerType),
      StructField("v", DecimalType(38, 0)))),
    dedupe = false,
    layoutCols = Seq("kind", "i", "j"),
    strictCommit = true)

  /** Append one batch's moment cells. `batchId` must be deterministic
    * per run (replays overwrite their own delta — exactly-once). */
  def appendDelta(cells: DataFrame, dir: String, batchId: String): Unit =
    store.appendDelta(cells, dir, batchId)

  /** All committed cells: base generation ∪ committed deltas. */
  def load(spark: SparkSession, dir: String): DataFrame =
    store.load(spark, dir, excludeDelta = None)

  /** Cells AS OF a batch id (ordered ids required) — PCA time travel:
    * the component the corpus had at that point, bit-exact. */
  def loadAsOf(spark: SparkSession, dir: String,
      upToBatch: String): DataFrame =
    store.loadAsOf(spark, dir, upToBatch)

  /** Fold deltas into the base generation (cells are kept as rows —
    * serving aggregates them, so compaction needs no dedupe). */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 4): Int =
    store.compact(spark, dir, numFiles)
}
