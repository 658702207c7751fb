package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordPiece

/** WordPiece tokenizer: greedy longest-match semantics on hand
  * examples, engine-kernel == witness laws for both the matcher and
  * the vocabulary derivation, and the encode checksum contract. */
class WordPieceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("wordpiece-spec", "4").getOrCreate()
  import spark.implicits._

  private def matchEngine(w: String, vocab: Map[String, Int]): Option[List[String]] = {
    val m = new java.util.HashMap[String, java.lang.Integer]()
    vocab.foreach { case (k, v) => m.put(k, Int.box(v)) }
    val out = new Array[String](math.max(1, w.length))
    val n = graft.functions.WordPieceKernel.matchWord(w, m, out)
    if (n < 0) None else Some(out.take(n).toList)
  }

  test("greedy longest-match: the reference WordPiece example shapes") {
    // the canonical BERT example: unaffable -> un ##aff ##able
    val v = Map("un" -> 0, "##aff" -> 1, "##able" -> 2, "u" -> 3,
      "n" -> 4, "##a" -> 5, "##f" -> 6, "##b" -> 7, "##l" -> 8, "##e" -> 9)
    assert(matchEngine("unaffable", v) == Some(List("un", "##aff", "##able")))
    assert(WordPiece.encodeWordWitness("unaffable", v) ==
      Some(List("un", "##aff", "##able")))
    // greedy takes the LONGEST available start even when a shorter one
    // would segment more cheaply downstream (greedy, not Viterbi)
    val v2 = Map("ab" -> 0, "a" -> 1, "##b" -> 2, "##c" -> 3, "abc" -> 4)
    assert(matchEngine("abc", v2) == Some(List("abc")))
    assert(matchEngine("abcc", v2) == Some(List("abc", "##c")))
    // dead end -> whole word UNK (no backtracking, the is_bad path):
    // "ab" matches, then "c" has no continuation piece
    val v3 = Map("ab" -> 0, "a" -> 1, "##b" -> 2)
    assert(matchEngine("abc", v3) == None)
    assert(WordPiece.encodeWordWitness("abc", v3) == None)
  }

  test("matcher law: engine kernel == witness over random words and vocabs") {
    val rnd = new scala.util.Random(20260814L)
    // '#' is in the alphabet DELIBERATELY: pieces colliding with the
    // "##" continuation marker are the one class where the two
    // implementations could genuinely diverge — the laws must reach it
    val cps = Seq("a", "b", "#", new String(Character.toChars(0x1F600)))
    for (trial <- 1 to 300) {
      val alpha = cps.take(1 + rnd.nextInt(cps.length))
      val wCps = Array.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length)))
      val w = wCps.mkString
      val vocab = scala.collection.mutable.Map.empty[String, Int]
      var id = 0
      // random subset of single cps in both roles + random substrings
      alpha.foreach { a =>
        if (rnd.nextBoolean()) { vocab(a) = id; id += 1 }
        if (rnd.nextBoolean()) { vocab("##" + a) = id; id += 1 }
      }
      for (_ <- 1 to rnd.nextInt(8)) {
        val s = rnd.nextInt(wCps.length)
        val e = math.min(wCps.length, s + 2 + rnd.nextInt(4))
        if (e - s >= 2) {
          val sub = wCps.slice(s, e).mkString
          val key = if (s == 0) sub else "##" + sub
          if (!vocab.contains(key)) { vocab(key) = id; id += 1 }
        }
      }
      val eng = matchEngine(w, vocab.toMap)
      val wit = WordPiece.encodeWordWitness(w, vocab.toMap)
      assert(eng == wit, s"trial $trial diverged on '$w' " +
        s"(vocab=${vocab.toMap}): engine=$eng witness=$wit")
      // reassembly: the FIRST piece is verbatim (a start piece may begin
      // with literal "##" when the word does); only continuations strip
      eng.foreach(ps => assert(
        ps.zipWithIndex.map { case (p, i) =>
          if (i > 0 && p.startsWith("##")) p.substring(2) else p
        }.mkString == w,
        s"trial $trial pieces don't reassemble '$w': $ps"))
    }
  }

  test("vocab law: distributed derivation == witness over random histograms") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 4) {
      // alphabet includes '#': words like "##ab" emit the literal "##"
      // start candidate, which BOTH sides must exclude (empty body) —
      // the pinned collision rule the laws exist to hold
      val hist = (1 to 5 + rnd.nextInt(10)).map { _ =>
        (Array.fill(1 + rnd.nextInt(8))("ab#d" (rnd.nextInt(4))).mkString,
          1L + rnd.nextInt(40))
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      val wit = WordPiece.deriveVocabWitness(hist, cap = 16, minCount = 2L)
      val eng = WordPiece.deriveVocab(hist.toDF("word", "n"),
        cap = 16, minCount = 2L)
      assert(eng == wit, s"trial $trial diverged:\n eng=$eng\n wit=$wit")
    }
  }

  test("from-trained law: distributed derivation == witness; counts conserve") {
    import graft.operators.UnigramLm
    val rnd = new scala.util.Random(146L)
    for (trial <- 1 to 3) {
      val hist = (1 to 6 + rnd.nextInt(10)).map { _ =>
        (Array.fill(1 + rnd.nextInt(9))("abcde" (rnd.nextInt(5))).mkString,
          1L + rnd.nextInt(30))
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      val histDf = hist.toDF("word", "n")
      val (pieces, _) = UnigramLm.train(histDf)
      val eng = WordPiece.fromTrained(histDf, pieces)
      val wit = WordPiece.fromTrainedWitness(hist, pieces)
      assert(eng == wit, s"trial $trial diverged:\n eng=$eng\n wit=$wit")
      // conservation: total form count == total segmented piece count
      // (every occurrence lands in exactly one positional form)
      val counts = pieces.map(p => p.piece -> p.count).toMap
      val (costSeq, unk) = (counts.toSeq.map { case (p, c) =>
        p -> graft.functions.UnigramViterbi.cost(
          math.max(1L, counts.values.sum), c) },
        graft.functions.UnigramViterbi.unknownCost(
          math.max(1L, counts.values.sum)))
      val totalPieces = hist.map { case (w, n) =>
        UnigramLm.segmentWitness(w, costSeq.toMap, unk).size * n }.sum
      assert(eng.map(_.count).sum == totalPieces)
      // every continuation form's body is a trained piece or a single
      // code point (UNK fallback); start forms likewise
      val trained = pieces.map(_.piece).toSet
      eng.foreach { p =>
        val body = if (p.piece.startsWith("##")) p.piece.substring(2) else p.piece
        assert(trained.contains(body) || UnigramLm.cpCount(body) == 1,
          s"form ${p.piece} has untrained multi-cp body")
      }
    }
  }

  test("encode report: checksum contract, UNK loudness, empty doc") {
    val hist = Seq(("ab", 3L), ("cd", 2L)).toDF("word", "n")
    val vocab = WordPiece.deriveVocab(hist, cap = 4, minCount = 2L)
    val ids = vocab.map(p => p.piece -> p.id).toMap
    // "xy" is UNK under this vocab (no 'x' piece)
    val docs = Seq((1L, "ab cd"), (2L, "ab xy"), (3L, "")).toDF("doc_id", "text")
    val out = WordPiece.encodeReport(docs, vocab).orderBy("doc_id").collect()
    def fold(words: Seq[String]): (Long, Long, Long) = {
      var n = 0L; var unk = 0L
      var h = graft.functions.BpeEncodeExpr.ChecksumOffset
      words.foreach { w =>
        WordPiece.encodeWordWitness(w, ids) match {
          case Some(ps) => ps.foreach { p =>
            h = h * graft.functions.BpeEncodeExpr.ChecksumPrime + (ids(p) + 1L)
            n += 1
          }
          case None =>
            n += 1; unk += 1
            h = h * graft.functions.BpeEncodeExpr.ChecksumPrime
        }
      }
      (n, unk, h)
    }
    val e1 = fold(Seq("ab", "cd"))
    val e2 = fold(Seq("ab", "xy"))
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3)) == e1)
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getLong(3)) == e2)
    assert(out(1).getLong(2) == 1L, "xy must be UNK")
    assert(out(2).getLong(1) == 0L && out(2).getLong(3) ==
      graft.functions.BpeEncodeExpr.ChecksumOffset)
  }
}
