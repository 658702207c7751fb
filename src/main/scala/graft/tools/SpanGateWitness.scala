package graft.tools

import org.apache.spark.sql.functions._

/** Scale pin for the streaming span-gate ingestion loop — the rolling-
  * bloom path the DuckDB gate cannot reach (it is a stateful loop over
  * a persisted store, not one SQL query). Seeds a
  * [[graft.sources.FingerprintStore]] from the `doc_id % 3 == 0` split
  * (q121's store fixture convention, 16-token windows, a date-named
  * delta so the batch/stream namespaces stay disjoint), then drives
  * [[graft.operators.CorpusOps.spanGateIngest]] over the remaining
  * documents in K micro-batches and checks per batch:
  *
  *   - ZERO false negatives — every admitted document is also admitted
  *     by [[graft.operators.CorpusOps.spanGateExact]] against the
  *     store snapshot taken before the batch (the gate's hard
  *     contract: a stored span always gates);
  *   - bounded false positives — the bloom may over-drop clean
  *     documents at the filter's per-probe fpp; the witness reports
  *     the per-batch rate and fails past 20% (at the default 4.2M
  *     geometry an sf1.0 store fills ~20%, putting the per-doc rate
  *     well under 1%);
  *   - per-batch wall time, which must not grow with the store (the
  *     rolling filter keeps per-batch work O(batch + filter files)).
  *
  * Batch 0 runs against a pre-seeded store with NO filter files — the
  * bootstrap path — so this also pins at scale that the bootstrap
  * filter persists under the loop's always-on replay exclusion and the
  * seeded fingerprints stay in the gate for every later batch.
  *
  * Usage: SpanGateWitness <sfDir> [nBatches]
  */
object SpanGateWitness {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 4
    val n = 16
    val spark = graft.core.GraftSession.get("spangate-witness")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables(spark, dir).documents
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val storeDir = java.nio.file.Files.createTempDirectory("graft-sgw").toString
    graft.sources.FingerprintStore.appendDelta(
      graft.operators.CorpusOps.spanFingerprints(
        docs.filter(col("doc_id") % 3 === 0), n),
      storeDir, "2026-08-14")
    graft.sources.FingerprintStore.compact(spark, storeDir)
    val rest = docs.filter(col("doc_id") % 3 =!= 0)

    var lastAdmitted: Set[Long] = Set.empty
    val ingest = graft.operators.CorpusOps.spanGateIngest(storeDir, n,
      sink = (df, _) => {
        lastAdmitted = df.select("doc_id").collect().map(_.getLong(0)).toSet
        ()
      }) _
    var ok = true
    for (b <- 0 until batches) {
      val batch = rest.filter(pmod(col("doc_id"), lit(batches)) === b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val batchCount = batch.count()
      // the exact-gate oracle over the store as it stands BEFORE the batch
      val exactAdmit = graft.operators.CorpusOps.spanGateExact(batch,
        graft.sources.FingerprintStore.load(spark, storeDir), n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val t0 = System.nanoTime()
      ingest(batch, b.toLong)
      val sec = (System.nanoTime() - t0) / 1e9
      val falseNeg = lastAdmitted -- exactAdmit
      val fpDropped = exactAdmit -- lastAdmitted
      val fpRate =
        if (exactAdmit.isEmpty) 0.0 else fpDropped.size.toDouble / exactAdmit.size
      println(f"[spangate-witness] batch=$b docs=$batchCount " +
        f"admitted=${lastAdmitted.size} exact=${exactAdmit.size} " +
        f"false_neg=${falseNeg.size} fp_dropped=${fpDropped.size} " +
        f"fp_rate=$fpRate%.4f sec=$sec%.1f")
      if (falseNeg.nonEmpty) {
        println(s"[spangate-witness] FALSE NEGATIVES: ${falseNeg.take(5)}")
        ok = false
      }
      if (fpRate > 0.2) ok = false
      batch.unpersist()
      ()
    }
    val stored = graft.operators.CorpusOps.storedSpanItems(spark, storeDir)
    println(s"[spangate-witness] stored_items=$stored " +
      s"regime=${if (stored > graft.operators.CorpusOps.DefaultSpanBloomCapacity) "exact" else "bloom"}")
    println(s"[spangate-witness] ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
