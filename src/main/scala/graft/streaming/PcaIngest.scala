package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

import graft.operators.Pca
import graft.sources.MomentStore

/** Streaming maintenance of the corpus principal component — the
  * always-fresh "what direction is this corpus growing in" view over
  * an unbounded embedding stream. Built on the EXACT mergeability of
  * [[Pca.momentCells]]: every cell is an integer, SUM/MAX merges are
  * associative, so serving from the accumulated store is BIT-EQUAL to
  * a monolithic [[Pca.topComponent]] over everything ever ingested —
  * a mergeable-summaries law with zero estimator error (stronger than
  * the HLL/theta contracts, which only promise estimate equality).
  *
  * Exactly-once under micro-batch retries by batch-id-keyed deltas
  * (the [[IndexIngest]] mechanism): a replayed batch overwrites its
  * own delta. Per-batch cost is one narrow pass over the batch; the
  * store grows by ≤ dim(dim+1)/2 + dim + 2 rows per batch and
  * compaction folds history whenever the delta listing gets long.
  * The corpus itself is NEVER re-read — at 100 TB/day of embeddings
  * the serve cost is the cell aggregation (kilobytes) plus a 64×64
  * driver iteration. */
object PcaIngest {

  /** foreachBatch sink: wire as
    * `.writeStream.foreachBatch(PcaIngest.momentSink(dir))`. */
  def momentSink(dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) =>
      ingest(batch.toDF(), dir, f"b$batchId%09d", idCol, vecCol)

  /** Summarize one batch and append it as the batch's own delta. */
  def ingest(batch: DataFrame, dir: String, batchId: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    MomentStore.appendDelta(Pca.momentCells(batch, idCol, vecCol),
      dir, batchId)

  /** The component of everything ingested so far — bit-equal to the
    * batch build over the union of all ingested rows. */
  def serveTopComponent(spark: SparkSession, dir: String,
      iters: Int = Pca.Iters): DataFrame =
    Pca.topComponentFromCells(MomentStore.load(spark, dir), iters)

  /** The component the corpus had AS OF a batch id — drift analysis
    * (compare against [[serveTopComponent]]'s current direction). */
  def serveTopComponentAsOf(spark: SparkSession, dir: String,
      upToBatch: String, iters: Int = Pca.Iters): DataFrame =
    Pca.topComponentFromCells(MomentStore.loadAsOf(spark, dir, upToBatch),
      iters)
}
