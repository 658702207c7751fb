package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{UnigramCandidatesExpr, UnigramViterbi}

/** WordPiece tokenizer family (BERT's tokenizer; Devlin et al. 2019):
  * a flat vocabulary whose continuation pieces carry the `##` prefix,
  * applied by greedy longest-match-first. Completes the engine's
  * tokenizer coverage next to BPE (q129/q130/q136) and unigram-LM
  * (q137/q138).
  *
  * The PINNED vocabulary derivation (engine and witness implement it
  * with independent mechanisms — explode aggregation with a
  * distributed TakeOrdered cap vs nested driver loops):
  *
  *   - CANDIDATES: over every distinct word w with count n, each
  *     code-point substring occurrence (overlapping, length
  *     1..MaxPieceLen) contributes n — counted AS its vocabulary form:
  *     as-is when it starts at position 0, `##`-prefixed otherwise.
  *   - VOCAB: every single-code-point piece in BOTH roles is PROTECTED
  *     (so the greedy matcher is total up to genuine alphabet holes);
  *     plus the top `cap` multi-cp pieces with count ≥ `minCount`,
  *     ordered (count desc, piece UTF-8-binary asc).
  *   - IDS: vocab sorted (count desc, piece UTF-8 asc) → 0..V−1 —
  *     piece strings INCLUDE the `##` prefix, so start and
  *     continuation roles get distinct ids (the BERT layout).
  *
  * Segmentation contract is documented on [[graft.functions
  * .WordPieceKernel]] (greedy longest-match, whole-word UNK on a
  * dead end, UNK contributes 0 to the checksum). */
object WordPiece {

  final case class WpPiece(id: Int, piece: String, count: Long)

  private val pieceOrd = UnigramLm.pieceOrd // the shared piece ordering

  private def cpCountVocab(p: String): Int = {
    val body = if (p.startsWith("##")) p.substring(2) else p
    body.codePointCount(0, body.length)
  }

  /** Distributed vocabulary derivation over a (word, n) histogram —
    * ONE job; the cap is applied by TakeOrdered so the driver collect
    * is alphabet + cap rows, never the distinct-substring histogram. */
  def deriveVocab(hist: DataFrame, cap: Int = 512, minCount: Long = 2L)
      : Seq[WpPiece] = {
    val cand = hist
      .select(explode(UnigramCandidatesExpr.of(col("word"),
        contPrefix = "##")).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("c"))
    // classification is by BODY code-point count (after stripping a ##
    // prefix; Spark length() counts code points): body 1 = protected
    // single, body >= 2 = cappable multi. The LITERAL piece "##" (a
    // word starting with two '#' characters yields it as a START
    // candidate; body would be empty) is EXCLUDED from both branches —
    // it would collide with the continuation marker itself, and the
    // witness's body-count rule drops it the same way.
    val bodyLen = when(col("piece").startsWith("##"),
      length(col("piece")) - 2).otherwise(length(col("piece")))
    val isSingle = bodyLen === 1
    val seed = cand.filter(isSingle)
      .unionByName(
        cand.filter(bodyLen >= 2 && col("c") >= minCount)
          .orderBy(col("c").desc, col("piece").asc).limit(cap))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    seed.sorted(pieceOrd).zipWithIndex.map { case ((p, c), i) =>
      WpPiece(i, p, c)
    }
  }

  /** Per-document encode report — the q142 shape: one narrow per-row
    * pass (the vocabulary rides inside the expression), no shuffle. */
  def encodeReport(docs: DataFrame, vocab: Seq[WpPiece],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ids = vocab.map(p => p.piece -> p.id).toMap
    docs.select(col(idCol),
      graft.functions.WordPieceEncodeExpr.of(
        graft.functions.TextFunctions.tokens(col(textCol)), ids).as("e"))
      .select(col(idCol), col("e.n_pieces").as("n_pieces"),
        col("e.n_unk").as("n_unk"), col("e.checksum").as("checksum"))
  }

  def vocabToDf(spark: SparkSession, vocab: Seq[WpPiece]): DataFrame = {
    import spark.implicits._
    vocab.map(p => (p.id.toLong, p.piece, p.count))
      .toDF("piece_id", "piece", "piece_count")
  }

  /** WordPiece vocabulary derived FROM A TRAINED unigram-LM tokenizer —
    * the BERT pipeline's actual derivation order (train a
    * subword inventory first, then materialize its start/continuation
    * forms), vs [[deriveVocab]]'s raw-substring frequency shortcut.
    * The PINNED contract:
    *
    *   - SEGMENT the (word, n) histogram under the trained piece costs
    *     (the q137/q138 Viterbi contract, same tie-breaks);
    *   - each segmented piece occurrence contributes its word's count n
    *     AS its vocabulary form: as-is at word start, `##`-prefixed as
    *     a continuation — so the SAME trained piece yields two entries
    *     with independent observed counts (the BERT layout);
    *   - vocabulary = every observed form (no cap needed: forms are
    *     bounded by 2 × (trained vocab + alphabet), already capped at
    *     train time — unlike raw substring counting, whose candidate
    *     space is corpus-shaped and needs the TakeOrdered cap);
    *   - IDS: forms sorted (count desc, piece UTF-8-binary asc) →
    *     0..V−1.
    *
    * Mechanism: one explode-aggregate job over the DISTINCT-WORD
    * histogram (never the corpus — segmentation cost scales with
    * vocabulary, not tokens); the collect is vocabulary-shaped. */
  def fromTrained(hist: DataFrame,
      pieces: Seq[UnigramLm.UnigramPiece]): Seq[WpPiece] = {
    val counts = pieces.map(p => p.piece -> p.count).toMap
    val (costs, unk) = UnigramLm.costLaw(counts)
    val seed = hist
      .select(col("n"),
        posexplode(graft.functions.UnigramSegmentExpr.of(col("word"),
          costs, unk)).as(Seq("pos", "piece")))
      .select(when(col("pos") === 0, col("piece"))
        .otherwise(concat(lit("##"), col("piece"))).as("form"), col("n"))
      .groupBy(col("form")).agg(sum(col("n")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    seed.sorted(pieceOrd).zipWithIndex.map { case ((p, c), i) =>
      WpPiece(i, p, c)
    }
  }

  // ------------------------------------------------------------------
  // Independent sequential WITNESS — nested-loop candidate counting,
  // an index-walk greedy matcher, plain maps; shares the contract, not
  // the mechanism.
  // ------------------------------------------------------------------

  def deriveVocabWitness(hist: Seq[(String, Long)], cap: Int = 512,
      minCount: Long = 2L): Seq[WpPiece] = {
    val cnt = new scala.collection.mutable.HashMap[String, Long]()
    hist.foreach { case (w, n) =>
      val cps = LmOps.codePointChars(w)
      var s = 0
      while (s < cps.length) {
        var len = 1
        val top = math.min(UnigramViterbi.MaxPieceLen, cps.length - s)
        while (len <= top) {
          val sub = cps.slice(s, s + len).mkString
          val key = if (s == 0) sub else "##" + sub
          cnt(key) = cnt.getOrElse(key, 0L) + n
          len += 1
        }
        s += 1
      }
    }
    val singles = cnt.iterator.filter { case (p, _) => cpCountVocab(p) == 1 }
      .toSeq
    val multis = cnt.iterator
      .filter { case (p, c) => cpCountVocab(p) > 1 && c >= minCount }
      .toSeq.sorted(pieceOrd).take(cap)
    (singles ++ multis).sorted(pieceOrd).zipWithIndex.map {
      case ((p, c), i) => WpPiece(i, p, c)
    }
  }

  /** [[fromTrained]]'s witness: [[UnigramLm.segmentWitness]] (memoized
    * recursion vs the engine's iterative DP expression) per histogram
    * word, positional form counting by a plain driver map. */
  def fromTrainedWitness(hist: Seq[(String, Long)],
      pieces: Seq[UnigramLm.UnigramPiece]): Seq[WpPiece] = {
    val counts = pieces.map(p => p.piece -> p.count).toMap
    val (costSeq, unk) = UnigramLm.costLaw(counts)
    val costs = costSeq.toMap
    val cnt = new scala.collection.mutable.HashMap[String, Long]()
    hist.foreach { case (w, n) =>
      var pos = 0
      UnigramLm.segmentWitness(w, costs, unk).foreach { p =>
        val key = if (pos == 0) p else "##" + p
        cnt(key) = cnt.getOrElse(key, 0L) + n
        pos += 1
      }
    }
    cnt.toSeq.sorted(pieceOrd).zipWithIndex.map { case ((p, c), i) =>
      WpPiece(i, p, c)
    }
  }

  /** Witness greedy matcher: walks the code-point list with explicit
    * indices (vs the kernel's UTF-16-offset substring scan). Returns
    * pieces, or Nil with unk=true. */
  def encodeWordWitness(word: String, vocab: Map[String, Int])
      : Option[List[String]] = {
    val cps = LmOps.codePointChars(word)
    val out = List.newBuilder[String]
    var p = 0
    while (p < cps.length) {
      var len = math.min(UnigramViterbi.MaxPieceLen, cps.length - p)
      var taken = -1
      while (len >= 1 && taken < 0) {
        val sub = cps.slice(p, p + len).mkString
        val key = if (p == 0) sub else "##" + sub
        if (vocab.contains(key)) { out += key; taken = len }
        len -= 1
      }
      if (taken < 0) return None
      p += taken
    }
    Some(out.result())
  }
}
