package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Candidate-mass accounting for the two-stage dedup composition
  * (q205): on a clique-replicated corpus (every `cliqueMod`-th doc
  * re-entered `cliqueK` times under shifted ids — the shape that makes
  * raw exact-join candidate mass quadratic), measure
  *
  *   - the RAW [[Dedup.similarityJoinCandidates]] count (stage-2 cost
  *     with no collapse: each k-clique contributes ~k²/2 pairs),
  *   - the LSH components → keep-best survivor count (stage 1), and
  *   - the survivor-set candidate count (stage-2 cost AFTER collapse).
  *
  * Usage: runMain graft.tools.DedupMassProbe <sfDir> [cliqueK] [cliqueMod]
  * Prints one JSON line; exit 1 if the collapse did NOT bound the mass
  * (survivor candidates must drop below raw by at least the clique
  * pair mass). */
object DedupMassProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DedupMassProbe <sfDir> [cliqueK] [cliqueMod]")
    val sfDir = args(0)
    val cliqueK = if (args.length > 1) args(1).toInt else 16
    val cliqueMod = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("dedup-mass-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    // clique replication: copy r of doc d enters as doc_id + r·10^8
    val corpus = (1 to cliqueK).foldLeft(docs) { (acc, r) =>
      acc.unionByName(docs.filter(col("doc_id") % cliqueMod === 0)
        .select((col("doc_id") + r.toLong * 100000000L).as("doc_id"),
          col("text")))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = corpus.count()
    val t0 = System.nanoTime()
    val rawCand = Dedup.similarityJoinCandidates(corpus, tMilli = 500).count()
    val tRaw = (System.nanoTime() - t0) / 1e9
    // stage 1: LSH near-dup components + keep-best survivors
    val t1 = System.nanoTime()
    val mh = Dedup.minhashed(corpus, "doc_id", "text",
      shingleSize = 3, numHashes = 12, rowsPerBand = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.nearDupPairsFromMinhashed(mh,
      threshold = 0.5, maxBucketSize = Some(100))
      .select(col("id_a"), col("id_b"))
    val comps = Dedup.connectedComponents(mh.select(col("id")), pairs)
    val scores = corpus.select(col("doc_id").as("id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
        .as("score"))
    val survivors = Dedup.keepBestPerComponent(comps, scores)
      .select(col("kept_id").as("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSurv = survivors.count()
    val tCollapse = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val survCand = Dedup.similarityJoinCandidates(
      corpus.join(survivors.hint("shuffle_hash"), Seq("doc_id")),
      tMilli = 500).count()
    val tSurv = (System.nanoTime() - t2) / 1e9
    println(s"""{"sf":"$sfDir","clique_k":$cliqueK,"n_docs":$nDocs,""" +
      s""""raw_candidates":$rawCand,"raw_sec":$tRaw,""" +
      s""""survivors":$nSurv,"collapse_sec":$tCollapse,""" +
      s""""survivor_candidates":$survCand,"survivor_sec":$tSurv}""")
    // the claim under test: collapse bounds the exact-stage mass
    val ok = survCand < rawCand && nSurv < nDocs
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
