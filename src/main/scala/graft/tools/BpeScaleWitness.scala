package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.LmOps

/** Scale witness for the batched incremental BPE trainer
  * ([[LmOps.bpeTrainFast]]): proves the three claims the unit specs
  * cannot —
  *
  *   1. EXACTNESS at production merge counts: the merge table must be
  *      identical, rank for rank, to [[LmOps.bpeTrainWitness]] (the
  *      sequential textbook implementation sharing no mechanism) at
  *      1,024+ merges.
  *   2. JOB ECONOMY: total Spark jobs must sit far below the merge
  *      count — the point of speculative batching; the per-merge loop
  *      pays one driver-synchronized job per merge, which at a real
  *      tokenizer's ~32k merges is hours of scheduler latency at any
  *      data size.
  *   3. PER-MERGE TIME vs the per-merge loop: an anchor run of
  *      [[LmOps.bpeTrain]] at a smaller merge count gives the
  *      seconds-per-merge baseline the fast path must beat.
  *
  * Two histograms run: the REAL corpus word histogram (exactness on
  * real data — the generator's vocabulary is only ~31 words, so merge
  * depth is bounded there) and a deterministic ZIPFIAN FIXTURE shaped
  * like a natural-language vocabulary (50k distinct words, skewed
  * letter unigrams, Zipf counts) that supports 1,024+ merges at
  * minPairCount=2 — the regime a deployed tokenizer trains in.
  *
  * Usage: BpeScaleWitness <sfDir> [merges=1024] [anchorMerges=48]
  *          [zipfDistinct=50000]
  * `zipfDistinct` scales the fixture vocabulary (100k supports the
  * ≥8k-merge tokenizer-scale run). Prints PASS/FAIL plus the stats
  * row for SCALE.md, including the driver pair-table peak — the
  * trainer's only data-shaped driver state. */
object BpeScaleWitness {

  /** Deterministic natural-language-shaped word histogram: `distinct`
    * words of skewed letters, Zipf-distributed counts. */
  def zipfHistogram(distinct: Int, seed: Long = 20260814L): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    // English-ish letter skew: probability ∝ weight
    val letters = "etaoinshrdlcumwfgypbvkjxqz"
    val weights = Array(120, 91, 81, 77, 73, 70, 63, 61, 60, 43, 40, 28,
      27, 24, 23, 22, 20, 19, 15, 10, 8, 7, 2, 2, 1, 1)
    val cum = weights.scanLeft(0)(_ + _).tail
    val total = cum.last
    def letter(): Char = {
      val x = rnd.nextInt(total)
      letters(cum.indexWhere(x < _))
    }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < distinct) {
      val len = 2 + rnd.nextInt(11)
      seen += Array.fill(len)(letter()).mkString
    }
    seen.toSeq.zipWithIndex.map { case (w, i) =>
      (w, math.max(1L, 200000L / (i + 1L)))
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val merges = if (args.length > 1) args(1).toInt else 1024
    val anchorMerges = if (args.length > 2) args(2).toInt else 48
    val zipfDistinct = if (args.length > 3) args(3).toInt else 50000
    val spark = graft.core.GraftSession.get("bpe-scale-witness")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- part 1: real corpus histogram (exactness on real data) -----
    val corpusHist = LmOps.wordHistogram(
      graft.core.Tables(spark, dir).documents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusSeq = corpusHist.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val corpusWit = LmOps.bpeTrainWitness(corpusSeq, merges, minPairCount = 1L)
    val (corpusFast, corpusStats) =
      LmOps.bpeTrainFast(corpusHist, merges, minPairCount = 1L)
    val corpusOk = corpusFast == corpusWit
    println(s"[bpe-witness] corpus: ${corpusSeq.size} distinct words, " +
      s"${corpusWit.size} merges (minPairCount=1), identical=$corpusOk, " +
      s"stats=$corpusStats")
    corpusHist.unpersist()

    // --- part 2: zipfian fixture at tokenizer scale -----------------
    val zipfSeq = zipfHistogram(zipfDistinct)
    val zipfHist = zipfSeq.toDF("word", "n")
      .repartition(32).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    zipfHist.count()

    val t0 = System.nanoTime()
    val wit = LmOps.bpeTrainWitness(zipfSeq, merges, minPairCount = 2L)
    val witSec = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-witness] zipf sequential witness: ${wit.size} merges in $witSec%.1f s")

    val t1 = System.nanoTime()
    val (fast, stats) = LmOps.bpeTrainFast(zipfHist, merges, minPairCount = 2L)
    val fastSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val anchor = LmOps.bpeTrain(zipfHist, anchorMerges, minPairCount = 2L)
    val anchorSec = (System.nanoTime() - t2) / 1e9
    val anchorOk = anchor == wit.take(anchor.size)

    val identical = fast == wit
    val perMergeFast = fastSec / math.max(1, stats.merges)
    val perMergeAnchor = anchorSec / math.max(1, anchor.size)
    println(f"[bpe-witness] zipf fast: ${stats.merges} merges, " +
      f"${stats.batches} batches (${stats.truncations} truncated, max " +
      f"${stats.maxBatch}, mean ${stats.merges.toDouble / math.max(1, stats.batches)}%.1f), " +
      f"${stats.sparkJobs} jobs, $fastSec%.1f s ($perMergeFast%.3f s/merge), " +
      f"pair-table peak ${stats.pairTablePeak} entries")
    println(f"[bpe-witness] zipf per-merge-loop anchor: ${anchor.size} merges, " +
      f"$anchorSec%.1f s ($perMergeAnchor%.3f s/merge), prefix-match=$anchorOk")
    println(f"[bpe-witness] identical-to-witness=$identical " +
      f"jobs/merges=${stats.sparkJobs.toDouble / math.max(1, stats.merges)}%.3f " +
      f"speedup-per-merge=${perMergeAnchor / math.max(1e-9, perMergeFast)}%.1fx")

    val pass = corpusOk && identical && anchorOk &&
      wit.size >= math.min(merges, 1024) &&
      stats.sparkJobs * 4 <= stats.merges &&
      perMergeFast < perMergeAnchor
    println(if (pass) "[bpe-witness] PASS" else "[bpe-witness] FAIL")
    zipfHist.unpersist()
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
