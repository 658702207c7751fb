package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{UnigramCandidatesExpr, UnigramSegmentExpr, UnigramViterbi}

/** Unigram-LM (SentencePiece-style) tokenizer training and
  * segmentation — the OTHER tokenizer family a training pipeline ships
  * next to BPE (Kudo 2018: a vocabulary of pieces with unigram
  * probabilities, EM-estimated, segmentation by Viterbi). Re-expressed
  * for the engine's determinism rules as integer-exact HARD EM
  * (Viterbi counts, not expected counts — deterministic, no floating
  * accumulation), with the same capped-model discipline as the BPE
  * trainer: all data-shaped work is distributed (candidate explosion,
  * per-round recounts, final encode); driver state is vocabulary-sized.
  *
  * The PINNED training pipeline (engine and witness implement this
  * contract with independent mechanisms — iterative array DP vs
  * memoized recursion, Spark aggregation vs plain maps):
  *
  *   1. SEED: candidate piece counts = over every distinct word w with
  *      count n, each code-point substring occurrence (overlapping,
  *      length 1..MaxPieceLen) contributes n. The seed vocabulary is
  *      the PROTECTED alphabet (every single-code-point piece) plus the
  *      top `candidateCap` multi-cp candidates with seed count ≥
  *      `minCount`, ordered (count desc, piece UTF-8-binary asc).
  *   2. EM ROUNDS (`emRounds`): costs from current counts by the law
  *      below; E-step re-counts pieces from the Viterbi segmentation of
  *      every word (weighted by n); multi-cp pieces that received count
  *      0 are dropped, alphabet pieces always survive.
  *   3. PRUNE to `vocabTarget`: alphabet + top multi-cp pieces by
  *      (count desc, piece UTF-8 asc).
  *   4. One final E-step recount under the pruned vocabulary, then
  *      final costs from the final counts.
  *
  * COST LAW (integer-exact, the repo's bitLen convention): with
  * N = max(1, Σ counts over the current vocabulary),
  * cost(c ≥ 1) = 1 + bitLen(N div c); a retained count-0 piece costs
  * 2 + bitLen(N); an unknown code point 3 + bitLen(N). Viterbi
  * minimizes (Σ cost, piece count) lexicographically; ties resolve to
  * the longest piece at each position from the left.
  *
  * VOCAB IDS: final pieces sorted (count desc, piece UTF-8 asc) get
  * ids 0..V−1 — the layout q137 reports and q138 encodes under. */
object UnigramLm {

  final case class UnigramPiece(id: Int, piece: String, count: Long, cost: Long)

  final case class UnigramParams(candidateCap: Int = 256, minCount: Long = 2L,
      emRounds: Int = 2, vocabTarget: Int = 64)

  /** Instrumentation: `sparkJobs` must stay `emRounds + 2` (seed +
    * rounds + final recount) — train cost is round-shaped, never
    * merge- or data-shaped. */
  final case class UnigramStats(sparkJobs: Int, seedCandidates: Int,
      vocabAfterEm: Int, alphabetSize: Int)

  /** (count desc, piece UTF-8-binary asc) — the one piece ordering all
    * three tokenizer trainers share for caps, prunes, and id layout. */
  private[operators] val pieceOrd: Ordering[(String, Long)] =
    Ordering.by[(String, Long), (Long, String)] { case (p, c) => (-c, p) }(
      Ordering.Tuple2(Ordering.Long, graft.functions.Utf8Order))

  private[operators] def costLaw(counts: Map[String, Long]): (Seq[(String, Long)], Long) = {
    val n = math.max(1L, counts.valuesIterator.sum)
    (counts.toSeq.map { case (p, c) => p -> UnigramViterbi.cost(n, c) },
      UnigramViterbi.unknownCost(n))
  }

  /** Distributed trainer over a (word, n) histogram frame. Every
    * E-step is ONE job: Viterbi-segment each distinct word under the
    * broadcast cost table (a native codegen'd expression), explode,
    * re-count. The histogram should be persisted by the caller when
    * reused (the q129 convention). */
  def train(hist: DataFrame, params: UnigramParams = UnigramParams())
      : (Seq[UnigramPiece], UnigramStats) = {
    var jobs = 0
    // 1. seed candidates (one job) — the CAP is applied DISTRIBUTEDLY
    // (TakeOrdered on (count desc, piece UTF-8 asc) — Spark string
    // ordering IS binary UTF-8, the pieceOrd twin), so the driver
    // collect is alphabet + candidateCap rows, never the corpus-shaped
    // distinct-substring histogram. Spark's length() counts CODE
    // POINTS (UTF8String.numChars), the cpCount twin.
    val cand = hist
      .select(explode(UnigramCandidatesExpr.of(col("word"))).as("piece"),
        col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("c"))
    val seed = cand.filter(length(col("piece")) === 1)
      .unionByName(
        cand.filter(length(col("piece")) > 1 && col("c") >= params.minCount)
          .orderBy(col("c").desc, col("piece").asc)
          .limit(params.candidateCap))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    jobs += 1
    val alphabet = seed.filter { case (p, _) => cpCount(p) == 1 }.toMap
    val multis = seed.filter { case (p, _) => cpCount(p) > 1 }
    var counts: Map[String, Long] = alphabet ++ multis
    val seedSize = counts.size

    // 2. EM rounds
    def eStep(): Map[String, Long] = {
      val (costs, unk) = costLaw(counts)
      val counted = hist
        .select(explode(UnigramSegmentExpr.of(col("word"), costs, unk))
          .as("piece"), col("n"))
        .groupBy(col("piece")).agg(sum(col("n")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      jobs += 1
      // alphabet is protected at count 0; unknown cps can surface from
      // the segmenter only as alphabet members (same corpus), but keep
      // the union total anyway
      alphabet.map { case (p, _) => p -> counted.getOrElse(p, 0L) } ++
        counted.filter { case (p, _) => cpCount(p) > 1 }
    }
    for (_ <- 1 to params.emRounds) counts = eStep()
    val vocabAfterEm = counts.size

    // 3. prune
    val keepMultis = counts.toSeq
      .filter { case (p, _) => cpCount(p) > 1 }
      .sorted(pieceOrd)
      .take(math.max(0, params.vocabTarget - alphabet.size))
    counts = alphabet.map { case (p, _) => p -> counts.getOrElse(p, 0L) } ++
      keepMultis

    // 4. final recount + final costs
    counts = eStep()
    val (finalCosts, _) = costLaw(counts)
    val costMap = finalCosts.toMap
    val pieces = counts.toSeq.sorted(pieceOrd).zipWithIndex.map {
      case ((p, c), i) => UnigramPiece(i, p, c, costMap(p))
    }
    (pieces, UnigramStats(jobs, seedSize, vocabAfterEm, alphabet.size))
  }

  /** Piece table as the q137 result frame. */
  def piecesToDf(spark: SparkSession, pieces: Seq[UnigramPiece]): DataFrame = {
    import spark.implicits._
    pieces.map(p => (p.id.toLong, p.piece, p.count, p.cost))
      .toDF("piece_id", "piece", "piece_count", "cost")
  }

  /** Per-document encode report under a trained vocabulary — the q138
    * result shape: one narrow per-row pass, no shuffle. */
  def encodeReport(docs: DataFrame, pieces: Seq[UnigramPiece],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val counts = pieces.map(p => p.piece -> p.count).toMap
    val (costs, unk) = costLaw(counts)
    val ids = pieces.map(p => p.piece -> p.id).toMap
    docs.select(col(idCol),
      graft.functions.UnigramEncodeExpr.of(
        graft.functions.TextFunctions.tokens(col(textCol)), costs, unk, ids)
        .as("e"))
      .select(col(idCol), col("e.n_pieces").as("n_pieces"),
        col("e.checksum").as("checksum"))
  }

  // ------------------------------------------------------------------
  // Independent sequential WITNESS — the q137/q138 oracle derivation.
  // Shares the CONTRACT above but no mechanism with the engine path:
  // candidate enumeration by per-word nested loops into a TreeMap-free
  // mutable map, segmentation by MEMOIZED RECURSION (vs the iterative
  // right-to-left array DP), and plain driver maps everywhere.
  // ------------------------------------------------------------------

  def cpCount(s: String): Int = s.codePointCount(0, s.length)

  /** Memoized-recursion Viterbi under the pinned contract; returns the
    * piece list. Mechanism-independent of [[UnigramViterbi.segment]]. */
  def segmentWitness(word: String, costs: Map[String, Long],
      unkCost: Long): List[String] = {
    val cps = LmOps.codePointChars(word)
    val memo = new scala.collection.mutable.HashMap[Int, (Long, Int, Int)]()
    // best(i) = (cost, nPieces, takeLen) over the suffix from cp i
    def best(i: Int): (Long, Int, Int) = {
      if (i >= cps.length) (0L, 0, 0)
      else memo.getOrElseUpdate(i, {
        var sol: (Long, Int, Int) = null
        // longest-first so an equal-score later candidate never replaces
        // the longer earlier one — the pinned left-greedy tie-break
        var len = math.min(UnigramViterbi.MaxPieceLen, cps.length - i)
        while (len >= 1) {
          val piece = cps.slice(i, i + len).mkString
          val pc = costs.get(piece) match {
            case Some(c) => c
            case None => if (len == 1) unkCost else -1L
          }
          if (pc >= 0L) {
            val (sc, sn, _) = best(i + len)
            val cand = (pc + sc, 1 + sn, len)
            if (sol == null || cand._1 < sol._1 ||
              (cand._1 == sol._1 && cand._2 < sol._2)) sol = cand
          }
          len -= 1
        }
        sol
      })
    }
    val out = List.newBuilder[String]
    var i = 0
    while (i < cps.length) {
      val (_, _, take) = best(i)
      out += cps.slice(i, i + take).mkString
      i += take
    }
    out.result()
  }

  /** Sequential trainer over a collected histogram — the fixture
    * derivation for the q137 oracle. */
  def trainWitness(hist: Seq[(String, Long)],
      params: UnigramParams = UnigramParams()): Seq[UnigramPiece] = {
    // seed by nested loops
    val seedCnt = new scala.collection.mutable.HashMap[String, Long]()
    hist.foreach { case (w, n) =>
      val cps = LmOps.codePointChars(w)
      var s = 0
      while (s < cps.length) {
        var len = 1
        val top = math.min(UnigramViterbi.MaxPieceLen, cps.length - s)
        while (len <= top) {
          val p = cps.slice(s, s + len).mkString
          seedCnt(p) = seedCnt.getOrElse(p, 0L) + n
          len += 1
        }
        s += 1
      }
    }
    val alphabet = seedCnt.iterator.filter { case (p, _) => cpCount(p) == 1 }
      .map(_._1).toSet
    val multis = seedCnt.iterator
      .filter { case (p, c) => cpCount(p) > 1 && c >= params.minCount }
      .toSeq.sorted(pieceOrd).take(params.candidateCap)
    var counts: Map[String, Long] =
      alphabet.iterator.map(p => p -> seedCnt(p)).toMap ++ multis

    def eStep(): Map[String, Long] = {
      val n = math.max(1L, counts.valuesIterator.sum)
      val costs = counts.map { case (p, c) => p -> UnigramViterbi.cost(n, c) }
      val unk = UnigramViterbi.unknownCost(n)
      val next = new scala.collection.mutable.HashMap[String, Long]()
      hist.foreach { case (w, wc) =>
        segmentWitness(w, costs, unk).foreach { p =>
          next(p) = next.getOrElse(p, 0L) + wc
        }
      }
      alphabet.iterator.map(p => p -> next.getOrElse(p, 0L)).toMap ++
        next.iterator.filter { case (p, _) => cpCount(p) > 1 }.toMap
    }
    for (_ <- 1 to params.emRounds) counts = eStep()
    val keep = counts.toSeq.filter { case (p, _) => cpCount(p) > 1 }
      .sorted(pieceOrd).take(math.max(0, params.vocabTarget - alphabet.size))
    counts = alphabet.iterator.map(p => p -> counts.getOrElse(p, 0L)).toMap ++ keep
    counts = eStep()
    val n = math.max(1L, counts.valuesIterator.sum)
    counts.toSeq.sorted(pieceOrd).zipWithIndex.map { case ((p, c), i) =>
      UnigramPiece(i, p, c, UnigramViterbi.cost(n, c))
    }
  }
}
