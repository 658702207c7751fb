package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, Dataset}

/** Structured-Streaming entry to the persisted retrieval indexes: a
  * `foreachBatch` sink that turns each micro-batch of documents into
  * one index delta. Exactly-once under retries because the DeltaStore
  * append is an OVERWRITE of the batch-id-keyed delta directory — a
  * replayed micro-batch rewrites its own delta instead of doubling it
  * (the FingerprintStore replay argument, reused verbatim).
  *
  * Contract inherited from the stores: documents must not span
  * micro-batches (positions/dl are computed within the owning batch —
  * the q157/q166 rule), which every source that emits whole documents
  * satisfies by construction. */
object IndexIngest {

  /** foreachBatch sink: positional postings of each (doc_id, text)
    * micro-batch appended to the [[graft.sources.PosPostingsStore]] at
    * `dir` under a batch-id-derived delta key. Wire as
    * `.writeStream.foreachBatch(IndexIngest.posPostingsSink(dir))`. */
  def posPostingsSink(dir: String, idCol: String = "doc_id",
      textCol: String = "text"): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) =>
      graft.sources.PosPostingsStore.appendDelta(
        graft.operators.Retrieval.posPostings(batch.toDF(), idCol, textCol),
        dir, f"stream-$batchId%06d")

  /** foreachBatch sink for the term-frequency index
    * ([[graft.sources.PostingsStore]]) — the BM25-serving twin. */
  def postingsSink(dir: String, idCol: String = "doc_id",
      textCol: String = "text"): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) =>
      graft.sources.PostingsStore.appendDelta(
        graft.operators.Retrieval.postings(batch.toDF(), idCol, textCol),
        dir, f"stream-$batchId%06d")
}
