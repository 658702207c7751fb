package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming maintenance of the weighted sample — the always-fresh
  * "k docs per source, weight-calibrated" view over an unbounded
  * ingestion stream, built on the mergeability of
  * [[graft.operators.PrioritySample]]: priorities are pure functions
  * of (id, w), so folding each micro-batch into the persisted
  * top-(k+1) state equals the batch sampler over everything ever
  * ingested (topState(A ∪ B) == topState(topState(A) ∪ B) — the
  * SampleIngestSpec parity law).
  *
  * Exactly-once under retries by IDEMPOTENCE, not batch-id keying: the
  * fold deduplicates (grp, id) before re-ranking, so a replayed
  * micro-batch's rows collapse onto the survivors already in state and
  * the fold is f(f(s, b), b) = f(s, b) — a different mechanism than
  * the index sinks' batch-id-keyed overwrite (those append
  * independent deltas; this folds into one summary).
  *
  * Crash safety mirrors the DeltaStore base swap: write `state.tmp`,
  * retire `state` → `state.old`, publish tmp → `state`, drop old;
  * readers fall back to `state.old` when a crash lands between the
  * renames. State is groups × (k+1) rows — kilobytes at any corpus
  * size, and each micro-batch's cost is one narrow pass over the
  * batch plus the O(k)-state heap aggregation. */
object SampleIngest {

  private val StateSchema = StructType(Seq(
    StructField("grp", StringType),
    StructField("rank", IntegerType),
    StructField("id", LongType),
    StructField("w", LongType),
    StructField("pr", LongType)))

  /** foreachBatch sink folding each (grp, id, w) micro-batch into the
    * persisted sample state at `dir`. Wire as
    * `.writeStream.foreachBatch(SampleIngest.sampleSink(dir, k))`. */
  def sampleSink(dir: String, k: Int, grpCol: String = "grp",
      idCol: String = "id", wCol: String = "w")
      : (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], _: Long) =>
      ingest(batch.toDF(), dir, k, grpCol, idCol, wCol)

  /** One fold: state ∪ batch, deduplicated by (grp, id), re-ranked to
    * the top-(k+1) summary, atomically published. */
  def ingest(batch: DataFrame, dir: String, k: Int,
      grpCol: String = "grp", idCol: String = "id",
      wCol: String = "w"): Unit = {
    val spark = batch.sparkSession
    val incoming = batch.select(col(grpCol).as("grp"),
      col(idCol).as("id"), col(wCol).cast("long").as("w"))
    val merged = loadState(spark, dir).select("grp", "id", "w")
      .unionByName(incoming)
      .dropDuplicates("grp", "id")
    val next = graft.operators.PrioritySample.topState(merged, k)
    publish(spark, dir, next)
  }

  /** The persisted top-(k+1) state (empty-safe; `state.old` fallback
    * mid-crash). */
  def loadState(spark: SparkSession, dir: String): DataFrame = {
    val f = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p =
      if (f.exists(new Path(s"$dir/state"))) Some(s"$dir/state")
      else if (f.exists(new Path(s"$dir/state.old"))) Some(s"$dir/state.old")
      else None
    p.map(spark.read.parquet(_)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StateSchema))
  }

  /** The served sample: τ/estimator finalization over the state —
    * identical to the batch sampler's output over everything folded
    * in so far. */
  def serve(spark: SparkSession, dir: String, k: Int): DataFrame =
    graft.operators.PrioritySample.estimate(loadState(spark, dir), k)

  private def publish(spark: SparkSession, dir: String,
      next: DataFrame): Unit = {
    val f = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$dir/state.tmp")
    val state = new Path(s"$dir/state")
    val old = new Path(s"$dir/state.old")
    if (f.exists(tmp)) f.delete(tmp, true)
    if (f.exists(old) && f.exists(state)) f.delete(old, true)
    // materialize BEFORE touching the live state: next reads it
    next.write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(state) && !f.rename(state, old))
      sys.error(s"sample state retire failed: $state -> $old")
    if (!f.rename(tmp, state))
      sys.error(s"sample state publish failed: $tmp -> $state")
    if (f.exists(old)) f.delete(old, true)
  }
}
