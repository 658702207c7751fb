package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the count-min key sketch — the always-fresh
  * join-cardinality planner over an unbounded ingestion stream, built
  * on the sketch's cellwise mergeability (SketchSpec law:
  * sketch(A ∪ B) == cellwise sum of sketch(A), sketch(B)): each
  * micro-batch's depth×width cell counts land as a batch-id-keyed
  * delta and [[serve]] folds cells with one groupBy-sum over the
  * (kilobyte-scale) store.
  *
  * This is q212's streaming story: the batch estimator sizes a join
  * you are ABOUT to run; this store sizes joins against a relation
  * that is still ARRIVING — e.g. "will today's feed still broadcast
  * against the dimension," answered without scanning the feed again.
  *
  * Exactly-once under replay by batch-id keying (a replayed batch
  * overwrites its own delta — the cell counts are per-batch absolutes,
  * not folds, so the overwrite is exact); compaction folds history
  * cellwise because the store dedupes nothing and serve sums. Store
  * size is bounded by batches × depth × width cells and compaction
  * collapses it to depth × width. */
object SketchIngest {

  /** foreachBatch sink: sketch the batch's key column, append the
    * cells. Wire as
    * `.writeStream.foreachBatch(SketchIngest.sketchSink(dir, keyCol, d, w))`. */
  def sketchSink(dir: String, keyCol: String, depth: Int, width: Int)
      : (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) =>
      ingest(batch.toDF(), dir, f"b$batchId%09d", keyCol, depth, width)

  /** One ingestion run: the batch's own sketch cells as its delta. */
  def ingest(batch: DataFrame, dir: String, batchId: String,
      keyCol: String, depth: Int, width: Int): Unit = {
    if (!batch.isEmpty) {
      graft.sources.SketchStore.appendDelta(
        graft.operators.Sketches.cmsKeySketch(batch, keyCol, depth, width),
        dir, batchId)
    }
  }

  /** The accumulated sketch: cellwise sum over everything ingested —
    * by the mergeability law, identical to sketching the union of all
    * batches in one pass. */
  def serve(spark: SparkSession, dir: String): DataFrame =
    graft.sources.SketchStore.load(spark, dir)
      .groupBy(col("hrow"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Join-size estimate of the STREAMED relation against a static
    * side: per hash row, Σ cntL·cntR over [[serve]] and a one-pass
    * sketch of `right` — min over rows is the estimate; every row is
    * ≥ the true join size (the q212 guarantee). Shapes must match. */
  def estimateAgainst(spark: SparkSession, dir: String,
      right: DataFrame, rightKey: String, depth: Int,
      width: Int): DataFrame =
    graft.operators.Sketches.cmsJoinEstimate(
      serve(spark, dir),
      graft.operators.Sketches.cmsKeySketch(right, rightKey, depth, width),
      depth)
}
