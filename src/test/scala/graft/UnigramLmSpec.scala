package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UnigramViterbi
import graft.operators.UnigramLm

/** Unigram-LM tokenizer: the Viterbi contract on hand-computed
  * examples, the engine-kernel == witness segmentation law over random
  * words/cost tables, distributed train == sequential witness over
  * random histograms, and the encode checksum contract. */
class UnigramLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("unigram-lm-spec", "4").getOrCreate()
  import spark.implicits._

  private def segmentEngine(w: String, costs: Map[String, Long],
      unk: Long): List[String] = {
    val table = UnigramViterbi.costTable(costs.toSeq)
    val out = new Array[String](math.max(1, w.length))
    val n = UnigramViterbi.segment(w, table, unk, out)
    out.take(n).toList
  }

  test("viterbi: hand-computed segmentation, cost then count then longest") {
    // costs: a=2 b=2 ab=3 aba=5, unk=9.
    // "abab": [ab][ab]=6 beats [a][b][a][b]=8, [aba][b]=7, [ab][a][b]=7.
    val costs = Map("a" -> 2L, "b" -> 2L, "ab" -> 3L, "aba" -> 5L)
    assert(segmentEngine("abab", costs, 9L) == List("ab", "ab"))
    assert(UnigramLm.segmentWitness("abab", costs, 9L) == List("ab", "ab"))
    // tie on (cost, count) resolves to the LONGEST piece from the left:
    // "aba" with ab=4: [aba]=5 vs [ab][a]=6 vs [a][b][a]=6 → aba wins on
    // cost; with aba=6: [aba]=6 == [ab][a]=4+2=6? ab=4,a=2 → 6, count 2
    // beats count... [aba] count 1 wins on COUNT at equal cost.
    val c2 = Map("a" -> 2L, "b" -> 2L, "ab" -> 4L, "aba" -> 6L)
    assert(segmentEngine("aba", c2, 9L) == List("aba"))
    assert(UnigramLm.segmentWitness("aba", c2, 9L) == List("aba"))
    // equal cost AND count: "aaaa" with a=1, aa=2, aaa=3: [aa][aa] and
    // [aaa][a] and [a][aaa] all cost 4 count 2 → longest-first takes
    // [aaa][a].
    val c3 = Map("a" -> 1L, "aa" -> 2L, "aaa" -> 3L)
    assert(segmentEngine("aaaa", c3, 9L) == List("aaa", "a"))
    assert(UnigramLm.segmentWitness("aaaa", c3, 9L) == List("aaa", "a"))
    // unknown code point segments as itself at unk cost, totality
    assert(segmentEngine("axb", Map("a" -> 1L, "b" -> 1L), 9L) ==
      List("a", "x", "b"))
    assert(UnigramLm.segmentWitness("axb", Map("a" -> 1L, "b" -> 1L), 9L) ==
      List("a", "x", "b"))
  }

  test("viterbi law: engine kernel == witness over random words and costs") {
    val rnd = new scala.util.Random(20260814L)
    // alphabet includes a non-BMP code point (two UTF-16 units): both
    // splitters are code-point based, and a surrogate-pair piece must
    // segment identically through the iterative DP and the recursion
    val cps = Seq("a", "b", "c", new String(Character.toChars(0x1F600)))
    for (trial <- 1 to 300) {
      val alpha = cps.take(1 + rnd.nextInt(cps.length))
      val w = Array.fill(1 + rnd.nextInt(12))(
        alpha(rnd.nextInt(alpha.length))).mkString
      // random piece table: all single cps plus random substrings
      val pieces = scala.collection.mutable.Map.empty[String, Long]
      alpha.foreach(c => pieces(c.toString) = 1L + rnd.nextInt(6))
      for (_ <- 1 to rnd.nextInt(8)) {
        val s = rnd.nextInt(w.length)
        val e = math.min(w.length, s + 2 + rnd.nextInt(4))
        if (e - s >= 2) pieces(w.substring(s, e)) = 1L + rnd.nextInt(6)
      }
      val unk = 7L + rnd.nextInt(3)
      val eng = segmentEngine(w, pieces.toMap, unk)
      val wit = UnigramLm.segmentWitness(w, pieces.toMap, unk)
      assert(eng == wit, s"trial $trial diverged on '$w' " +
        s"(pieces=${pieces.toMap}): engine=$eng witness=$wit")
      assert(eng.mkString == w, s"trial $trial not a segmentation of '$w'")
    }
  }

  test("train law: distributed == sequential witness over random histograms") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 6) {
      val vocabWords = 5 + rnd.nextInt(12)
      val hist = (1 to vocabWords).map { _ =>
        val len = 1 + rnd.nextInt(9)
        (Array.fill(len)("abcd" (rnd.nextInt(4))).mkString,
          1L + rnd.nextInt(50))
      }.distinct.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
        .toSeq
      val params = UnigramLm.UnigramParams(candidateCap = 32,
        minCount = 2L, emRounds = 2, vocabTarget = 24)
      val wit = UnigramLm.trainWitness(hist, params)
      val histDf = hist.toDF("word", "n")
      val (eng, stats) = UnigramLm.train(histDf, params)
      assert(eng == wit,
        s"trial $trial diverged:\n eng=$eng\n wit=$wit\n hist=$hist")
      assert(stats.sparkJobs == params.emRounds + 2,
        "train cost must be round-shaped: seed + emRounds + final recount")
    }
  }

  test("encode: ids, checksum contract, empty doc") {
    // tiny corpus → deterministic table; verify the engine encode row
    // against a driver fold over the witness segmentation
    val docs = Seq((1L, "ab ab a"), (2L, "")).toDF("doc_id", "text")
    val hist = Seq(("ab", 2L), ("a", 1L)).toDF("word", "n")
    val params = UnigramLm.UnigramParams(candidateCap = 8, minCount = 2L,
      emRounds = 1, vocabTarget = 8)
    val (pieces, _) = UnigramLm.train(hist, params)
    val counts = pieces.map(p => p.piece -> p.count).toMap
    val n = math.max(1L, counts.valuesIterator.sum)
    val costs = counts.map { case (p, c) => p -> UnigramViterbi.cost(n, c) }
    val unk = UnigramViterbi.unknownCost(n)
    val ids = pieces.map(p => p.piece -> p.id).toMap
    val expect = Seq("ab", "ab", "a")
      .flatMap(w => UnigramLm.segmentWitness(w, costs, unk))
      .map(ids)
    val out = UnigramLm.encodeReport(docs, pieces).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_pieces") == expect.length.toLong)
    assert(out(0).getAs[Long]("checksum") ==
      graft.functions.BpeEncodeExpr.checksum(expect))
    assert(out(1).getAs[Long]("n_pieces") == 0L)
    assert(out(1).getAs[Long]("checksum") ==
      graft.functions.BpeEncodeExpr.ChecksumOffset)
  }

  test("encode: pure per-row expression runs in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hist = Seq(("ab", 2L), ("a", 1L)).toDF("word", "n")
    val (pieces, _) = UnigramLm.train(hist,
      UnigramLm.UnigramParams(candidateCap = 8, minCount = 2L,
        emRounds = 1, vocabTarget = 8))
    val stream = MemoryStream[(Long, String)]
    val q = UnigramLm.encodeReport(stream.toDS().toDF("doc_id", "text"), pieces)
      .writeStream.format("memory").queryName("unigram_enc_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, "ab ab a"), (2L, ""))
      q.processAllAvailable()
      val batch = UnigramLm.encodeReport(
        Seq((1L, "ab ab a"), (2L, "")).toDF("doc_id", "text"), pieces)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = spark.sql(
        "SELECT doc_id, n_pieces, checksum FROM unigram_enc_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batch, s"stream/batch drift: $got vs $batch")
    } finally q.stop()
  }
}
