package graft.tools

import org.apache.spark.sql.functions._

/** Scale pin for the streaming QUERY-side retrieval serving loop
  * ([[graft.streaming.IndexIngest.bm25ServeSink]]) — a stateful loop
  * over a persisted store, outside the DuckDB gate's reach. Splits the
  * corpus documents into M ingest chunks, appends each through the
  * postings sink handler, and after every ingest runs one QUERY
  * micro-batch (a fixed probe set drawn from the corpus vocabulary)
  * through the serve handler, checking per batch:
  *
  *   - EQUALITY — the served top-k is bit-identical (scores included)
  *     to [[graft.operators.Retrieval.bm25TopK]] over a monolithic
  *     rebuild of exactly the documents ingested so far (the q157
  *     store law, per snapshot);
  *   - SNAPSHOT TRACKING — the same probe set re-asked as the index
  *     grows must see moving statistics (scores change between the
  *     first and last batch);
  *   - per-batch serve seconds, printed so SCALE.md can record how the
  *     probe cost tracks store size (the load is the store read; the
  *     scoring joins stay broadcast-query-sided).
  *
  * Exit nonzero on any mismatch. Usage:
  * ServeWitness <sfDir> [ingestBatches=4] [nQueries=8]
  */
object ServeWitness {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 4
    val nQueries = if (args.length > 2) args(2).toInt else 8
    val spark = graft.core.GraftSession.get("serve-witness")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = graft.core.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // probe set: two-term queries over the corpus's most frequent terms
    // (deterministic — frequency then term order), ids clear of doc ids
    val top = graft.operators.LmOps.wordHistogram(docs)
      .orderBy(col("n").desc, col("word").asc)
      .limit(2 * nQueries).collect().map(_.getString(0))
    val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0)
    val queries = (0 until nQueries)
      .map(i => (maxDoc + 1 + i, s"${top(2 * i)} ${top(2 * i + 1)}"))
      .toDF("query_id", "text")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-serve-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-serve-out").toString
    val ingest = graft.streaming.IndexIngest.postingsSink(idxDir)
    val serve = graft.streaming.IndexIngest.bm25ServeSink(idxDir, outDir, kTop = 10)
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    var failed = false
    var firstServed: Set[(Long, Long, Double, Int)] = Set.empty
    var lastServed: Set[(Long, Long, Double, Int)] = Set.empty
    for (b <- 0 until batches) {
      val chunk = docs.filter(pmod(col("doc_id"), lit(batches)) === b)
      ingest(chunk, b.toLong)
      val t0 = System.nanoTime()
      serve(queries, b.toLong)
      val serveSec = (System.nanoTime() - t0) / 1e9
      val served = collectSet(
        spark.read.parquet(f"$outDir/batch-$b%06d"))
      // monolithic rebuild of exactly the ingested prefix
      val soFar = docs.filter(pmod(col("doc_id"), lit(batches)) <= b)
      val post = graft.operators.Retrieval.postings(soFar)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nd, avgdl) = graft.operators.Retrieval.storeStats(post)
      val want = collectSet(graft.operators.Retrieval
        .bm25TopK(post, queries, nd, avgdl, kTop = 10))
      post.unpersist(false)
      val ok = served == want
      if (!ok) failed = true
      if (b == 0) firstServed = served
      lastServed = served
      println(f"[serve-witness] batch $b: store_docs<=${nd}%d " +
        f"serve=${serveSec}%.2f s rows=${served.size}%d " +
        f"parity=${if (ok) "OK" else "MISMATCH"}")
    }
    if (firstServed == lastServed && batches > 1) {
      println("[serve-witness] FAIL: scores never moved as the index grew")
      failed = true
    }
    docs.unpersist(false)
    if (failed) { println("[serve-witness] FAILED"); sys.exit(1) }
    println("[serve-witness] PASS")
    spark.stop()
  }
}
