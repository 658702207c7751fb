package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming SCD2 maintenance — the always-fresh versioned dimension
  * over an unbounded change stream: each micro-batch's (key, attr, ts,
  * seq) changes append to a persisted [[graft.sources.ChangeFeedStore]]
  * delta keyed by the batch id (replays overwrite their own delta —
  * exactly-once by construction), and [[serve]] derives the interval
  * table with ONE key-partitioned window pass over the feed
  * ([[graft.operators.Scd2.history]]).
  *
  * Ingest-appends / serve-derives (the index/moment-store shape)
  * rather than materialize-and-merge: a materialized interval table
  * must REWRITE each key's open row every batch — under replay that
  * fold is not idempotent without the strict-guard gymnastics
  * [[graft.operators.Scd2.merge]] exists to refuse — while the feed is
  * immutable and the derivation is total. The batch merge operator
  * remains the right tool for scheduled (non-replayed) warehouse
  * loads; the law merge(history(early), late) == history(all)
  * (Scd2Spec) is exactly why the two paths serve identical tables.
  *
  * Per-batch cost: one append of batch-sized rows. Serve cost: one
  * shuffle of the feed on the key (both windows share it). At 100 TB
  * of changes the feed compacts like any delta store and the serve
  * pass is per-key bounded — no driver state anywhere. */
object Scd2Ingest {

  /** foreachBatch sink appending each micro-batch's changes to the
    * feed at `dir`. Columns are normalized to the store schema
    * (k, attr, ts_us, seq). Wire as
    * `.writeStream.foreachBatch(Scd2Ingest.changeSink(dir))`. */
  def changeSink(dir: String, keyCol: String = "k",
      attrCol: String = "attr", tsUsCol: String = "ts_us",
      seqCol: String = "seq"): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) =>
      ingest(batch.toDF(), dir, f"b$batchId%09d",
        keyCol, attrCol, tsUsCol, seqCol)

  /** One ingestion run: append the batch's changes as its own delta. */
  def ingest(batch: DataFrame, dir: String, batchId: String,
      keyCol: String = "k", attrCol: String = "attr",
      tsUsCol: String = "ts_us", seqCol: String = "seq"): Unit = {
    if (!batch.isEmpty) {
      graft.sources.ChangeFeedStore.appendDelta(
        batch.select(col(keyCol).cast("long").as("k"),
          col(attrCol).cast("string").as("attr"),
          col(tsUsCol).cast("long").as("ts_us"),
          col(seqCol).cast("long").as("seq")),
        dir, batchId)
    }
  }

  /** The served SCD2 dimension: interval rows (k, attr, valid_from_us,
    * valid_to_us, seq, is_current) derived from everything ingested so
    * far — identical to [[graft.operators.Scd2.history]] over the
    * union of all batches (StreamingSpec pins it across replay and
    * compaction). */
  def serve(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Scd2.history(
      graft.sources.ChangeFeedStore.load(spark, dir),
      "k", Seq("attr"), "ts_us", "seq")
      .select(col("k"), col("attr"),
        col("valid_from").as("valid_from_us"),
        col("valid_to").as("valid_to_us"),
        col("seq"), col("is_current"))

  /** Time-travel serve: the dimension as of an ingestion batch. */
  def serveAsOf(spark: SparkSession, dir: String,
      upToBatch: String): DataFrame =
    graft.operators.Scd2.history(
      graft.sources.ChangeFeedStore.loadAsOf(spark, dir, upToBatch),
      "k", Seq("attr"), "ts_us", "seq")
      .select(col("k"), col("attr"),
        col("valid_from").as("valid_from_us"),
        col("valid_to").as("valid_to_us"),
        col("seq"), col("is_current"))
}
