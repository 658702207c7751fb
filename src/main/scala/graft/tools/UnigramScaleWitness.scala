package graft.tools

import graft.operators.{LmOps, UnigramLm}

/** Scale witness for the unigram-LM trainer ([[UnigramLm.train]]) —
  * the q137 discipline pushed to tokenizer-scale inputs the
  * generator's ~31-word corpus vocabulary cannot exercise:
  *
  *   1. EXACTNESS at scale: the full piece table (pieces, counts,
  *      costs, id layout) must be identical to [[UnigramLm
  *      .trainWitness]] on a natural-language-shaped histogram
  *      ([[BpeScaleWitness.zipfHistogram]], 100k distinct words) at a
  *      production-shaped vocabulary target (≥1k pieces).
  *   2. JOB SHAPE: `stats.sparkJobs == emRounds + 2` must hold
  *      regardless of vocabulary size — training cost is round-shaped,
  *      never vocabulary- or data-shaped (the BPE trainer needs
  *      vocabulary-many batches; unigram EM is a fixed handful of
  *      full passes, its structural advantage).
  *   3. DRIVER FOOTPRINT: candidate/vocab table sizes are reported —
  *      the only data-shaped driver state, bounded by the candidate
  *      cap, not the corpus.
  *
  * Usage: UnigramScaleWitness [distinct=100000] [candidateCap=8192]
  *          [vocabTarget=1024] [emRounds=2]
  * Prints PASS/FAIL plus the stats row for SCALE.md. */
object UnigramScaleWitness {
  def main(args: Array[String]): Unit = {
    val distinct = if (args.length > 0) args(0).toInt else 100000
    val cap = if (args.length > 1) args(1).toInt else 8192
    val target = if (args.length > 2) args(2).toInt else 1024
    val rounds = if (args.length > 3) args(3).toInt else 2
    val spark = graft.core.GraftSession.get("unigram-scale-witness")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val histSeq = BpeScaleWitness.zipfHistogram(distinct)
    val params = UnigramLm.UnigramParams(candidateCap = cap,
      minCount = 2L, emRounds = rounds, vocabTarget = target)

    val t0 = System.nanoTime()
    val wit = UnigramLm.trainWitness(histSeq, params)
    val witSec = (System.nanoTime() - t0) / 1e9
    println(f"[unigram-witness] sequential witness: ${wit.size} pieces in $witSec%.1f s")

    val hist = histSeq.toDF("word", "n").repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hist.count()
    val t1 = System.nanoTime()
    val (eng, stats) = UnigramLm.train(hist, params)
    val engSec = (System.nanoTime() - t1) / 1e9
    hist.unpersist()

    val identical = eng == wit
    println(f"[unigram-witness] distributed: ${eng.size} pieces, " +
      f"${stats.sparkJobs} jobs (seed candidates ${stats.seedCandidates}, " +
      f"vocab after EM ${stats.vocabAfterEm}, alphabet ${stats.alphabetSize}), " +
      f"$engSec%.1f s")
    println(s"[unigram-witness] identical-to-witness=$identical " +
      s"jobShape=${stats.sparkJobs == rounds + 2}")

    val pass = identical && stats.sparkJobs == rounds + 2 &&
      eng.size >= math.min(target, 256)
    println(if (pass) "[unigram-witness] PASS" else "[unigram-witness] FAIL")
    spark.stop()
    if (!pass) sys.exit(1)
  }
}
