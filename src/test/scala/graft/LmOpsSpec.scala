package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmOps

/** LM-flavored operators: unigram surprisal scoring, DSIR-style
  * importance weights, BPE training (distributed == sequential witness)
  * and BPE application semantics, all pinned on hand-computed examples.
  */
class LmOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("lm-ops-spec", "4").getOrCreate()
  import spark.implicits._

  // --------------------------------------------- NB quality classifier

  test("nb train: hand-computed weights on a controlled two-class corpus") {
    // 4 pos docs = one gram "a b" each; 4 neg docs = one gram "c d".
    // Tpos = Tneg = 4 → norm term 0; balanced doc counts → prior 0.
    // w(a b) = bitLen(4+1) − bitLen(0+1) = 2; w(c d) = −2.
    val docs = ((1 to 4).map(i => (i.toLong, "src0", "a b")) ++
      (5 to 8).map(i => (i.toLong, "src1", "c d")))
      .toDF("doc_id", "source", "text")
    val table = LmOps.nbTrainTable(docs, col("source") === "src0")
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(table((4L, 0L)) == 2L, s"pos-gram weight: $table")
    assert(table((0L, 4L)) == -2L, s"neg-gram weight: $table")
    assert(table.size == 2)
    val scores = LmOps.nbScore(docs, col("source") === "src0")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(scores(1L) == ((2L, true)) && scores(5L) == ((-2L, false)))
  }

  test("nb gate batch-parity law: expression == broadcast-join scorer, edge docs included") {
    val docs = Seq(
      (1L, "src0", "alpha beta gamma alpha beta"),
      (2L, "src0", "alpha beta"),
      (3L, "src1", "delta epsilon zeta"),
      (4L, "src1", "ríver 日本 ríver 日本語"), // multi-byte grams
      (5L, "src1", "single"), // 1 token -> short-gram fallback
      (6L, "src0", ""), // 0 tokens -> the "" gram
      (7L, "src1", "alpha delta beta epsilon"))
      .toDF("doc_id", "source", "text")
    val pred = col("source") === "src0"
    val batch = LmOps.nbScore(docs, pred).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val model = LmOps.nbModel(docs, pred)
    val gate = LmOps.nbGate(docs, model).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(batch.toSeq == gate.toSeq,
      s"parity broke:\n${batch.toSeq}\nvs\n${gate.toSeq}")
    assert(batch.length == 7, "every doc must emit a row")
    // the pos-looking doc outranks the neg-looking one
    val byId = batch.map(t => t._1 -> t._3).toMap
    assert(byId(1L) > byId(3L))
  }

  test("nb gate: pure predicate runs in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    // train offline on the labeled corpus, deploy the model inline —
    // the fastText admission shape
    val trainDocs = Seq(
      (1L, "src0", "good clean prose here"), (2L, "src0", "good clean text"),
      (3L, "src1", "spam spam buy now"), (4L, "src1", "buy spam now"))
      .toDF("doc_id", "source", "text")
    val model = LmOps.nbModel(trainDocs, col("source") === "src0")
    val stream = MemoryStream[(Long, String)]
    val q = LmOps.nbGate(stream.toDS().toDF("doc_id", "text"), model)
      .filter(col("keep"))
      .writeStream.format("memory").queryName("nb_gate_out")
      .outputMode("append").start()
    try {
      stream.addData((10L, "good clean prose here"), (11L, "spam spam buy now"))
      stream.addData((12L, "good clean text"), (13L, "buy spam now"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM nb_gate_out")
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(10L, 12L), s"admission set wrong: $got")
      // and the admitted set equals the batch scorer's keep set on the
      // same rows (the cross-mode parity the deployment relies on)
      val streamed = Seq((10L, "good clean prose here"),
        (11L, "spam spam buy now"), (12L, "good clean text"),
        (13L, "buy spam now")).toDF("doc_id", "text")
      val batchKeep = LmOps.nbGate(streamed, model).filter(col("keep"))
        .collect().map(_.getLong(0)).toSet
      assert(batchKeep == got)
    } finally q.stop()
  }

  // ------------------------------------------------------- byte-level BPE

  test("byte remap: 256-bijection, GPT-2 anchors, reversible through the apply scan") {
    import graft.functions.ByteBpe
    assert(ByteBpe.byteToChar.length == 256)
    assert(ByteBpe.byteToChar.forall(_.length == 1))
    assert(ByteBpe.byteToChar.distinct.length == 256, "remap not injective")
    assert(ByteBpe.charToByte.size == 256)
    (0 until 256).foreach(b =>
      assert(ByteBpe.charToByte(ByteBpe.byteToChar(b).charAt(0)) == b))
    // the published construction's anchor points: printables map to
    // themselves, space is the first remapped block's U+0120 ('Ġ')
    assert(ByteBpe.byteToChar('a'.toInt) == "a")
    assert(ByteBpe.byteToChar('!'.toInt) == "!")
    assert(ByteBpe.byteToChar(' '.toInt) == "Ġ")
    assert(ByteBpe.byteToChar(0) == "Ā")
    // every remap char is visible and whitespace-free (the property the
    // split-by-character seed and the whitespace tokenizer rely on)
    assert(ByteBpe.byteToChar.forall(s => !Character.isWhitespace(s.charAt(0))))
    // reversibility for multi-byte UTF-8 (2/3/4-byte sequences), with
    // and without merges applied on top
    val words = Seq("hello", "naïve", "日本語",
      new String(Character.toChars(0x1F642)) * 2, "mixé-x")
    val merges = Seq("h" -> "e", "he" -> "l",
      ByteBpe.byteToChar(0xC3) -> ByteBpe.byteToChar(0xAF))
    words.foreach { w =>
      val syms = LmOps.applyMergesScanSyms(ByteBpe.remap(w), merges)
      assert(ByteBpe.invert(syms.mkString) == w, s"roundtrip broke on $w")
      // no UNK by construction: the id table is total over every symbol
      val vocab = ByteBpe.vocabIds(merges.zipWithIndex.map { case ((a, b), i) =>
        LmOps.BpeMerge(i + 1, a, b, a + b, 1L) })
      syms.foreach(sym => assert(vocab.contains(sym), s"OOV symbol $sym"))
    }
  }

  test("byte-level train: distributed == sequential witness on multi-byte words") {
    import graft.functions.ByteBpe
    val docs = Seq(
      (1L, "ríver ríver ab ab 日本"),
      (2L, "ríver ab 日本 日本 zz"))
      .toDF("doc_id", "text")
    val hist = LmOps.wordHistogram(docs)
    val dist = LmOps.bpeTrainFast(LmOps.byteHistogram(hist), maxMerges = 8)._1
    val wit = LmOps.bpeTrainWitness(
      hist.collect().map(r => ByteBpe.remap(r.getString(0)) -> r.getLong(1))
        .toSeq, maxMerges = 8)
    assert(dist == wit, s"\n$dist\nvs\n$wit")
    assert(dist.nonEmpty)
    // and the byte id layout starts merges at 256 (ids 0..255 = bytes)
    val vocab = ByteBpe.vocabIds(dist)
    assert(vocab(dist.head.merged) == 256)
  }

  // ---------------------------------------------------------------- q127

  test("surprisal: hand-computed buckets, OOV worst case, empty-doc row") {
    // corpus: 8 'x', 4 'y', 2 'z', 2 'zz' = 16 tokens. vocab=3 keeps
    // x, y and (tie at 2, token asc) z — 'zz' is the OOV probe.
    val docs = Seq(
      (1L, "x x x x y y z"), // in-vocab mix
      (2L, "x x x x y y z zz zz"), // has OOV
      (3L, "")) // zero tokens
      .toDF("doc_id", "text")
    val out = LmOps.surprisalScores(docs, vocabSize = 3, threshMilli = 2000)
      .orderBy("doc_id").collect()
    // N=16: sb(x)=bitLen(16 div 8)=1, sb(y)=bitLen(4)=2, sb(z)=bitLen(8)=3,
    // OOV('zz')=bitLen(16)=4.
    val d1 = out(0)
    assert(d1.getAs[Long]("n_tokens") == 7)
    assert(d1.getAs[Long]("total_surprisal") == 4 * 1 + 2 * 2 + 1 * 3) // 11
    // mean 11/7 ≈ 1.571 bits < 2.0 → not low quality
    assert(!d1.getAs[Boolean]("low_quality"))
    val d2 = out(1)
    assert(d2.getAs[Long]("n_tokens") == 9)
    assert(d2.getAs[Long]("total_surprisal") == 11 + 2 * 4) // 19
    // mean 19/9 ≈ 2.111 > 2.0 → low quality
    assert(d2.getAs[Boolean]("low_quality"))
    val d3 = out(2)
    assert(d3.getAs[Long]("n_tokens") == 0)
    assert(d3.getAs[Long]("total_surprisal") == 0)
    assert(d3.getAs[Boolean]("low_quality")) // empty ⇒ junk
  }

  test("surprisal: vocab tie-break is (count desc, token asc)") {
    // 'a' and 'b' tie at 2 occurrences; vocabSize=1 must keep 'a'.
    val docs = Seq((1L, "a a b b")).toDF("doc_id", "text")
    val out = LmOps.surprisalScores(docs, vocabSize = 1, threshMilli = 9999)
      .collect()(0)
    // N=4: in-vocab a: bitLen(4 div 2)=1; OOV b: bitLen(4)=2.
    assert(out.getAs[Long]("total_surprisal") == 2 * 1 + 2 * 2)
  }

  test("bigram surprisal: hand-computed conditional buckets with backoff") {
    // corpus: doc1 "x y x y", doc2 "x z", doc3 "".
    // c2: "x y"=2, "y x"=1, "x z"=1; c1: x=3, y=2, z=1; N=6.
    // bigramVocab=2 keeps "x y" and (tie at 1, gram asc) "x z":
    //   sb("x y") = bitLen(c1(x)=3 div 2) = bitLen(1) = 0
    //   sb("x z") = bitLen(3 div 1) = 1
    // "y x" backs off to unigram(x) = bitLen(6 div 3)+1 = 2.
    val docs = Seq((1L, "x y x y"), (2L, "x z"), (3L, ""))
      .toDF("doc_id", "text")
    val out = LmOps.bigramSurprisalScores(docs, bigramVocab = 2,
      unigramVocab = 16, threshMilli = 800).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_bigrams") == 3)
    assert(out(0).getAs[Long]("total_surprisal") == 2 * 0 + 1 * 2) // 2
    assert(!out(0).getAs[Boolean]("low_quality")) // 667 milli <= 800
    assert(out(1).getAs[Long]("n_bigrams") == 1)
    assert(out(1).getAs[Long]("total_surprisal") == 1)
    assert(out(1).getAs[Boolean]("low_quality")) // 1000 milli > 800
    assert(out(2).getAs[Long]("n_bigrams") == 0)
    assert(out(2).getAs[Boolean]("low_quality")) // no bigrams ⇒ junk
  }

  test("surprisal gate: batch parity with the q127 low_quality flag") {
    val docs = Seq(
      (1L, "x x x x y y z"), (2L, "x x x x y y z zz zz"), (3L, ""),
      (4L, "x x x x x x x x"), (5L, "zz zz zz"))
      .toDF("doc_id", "text")
    val (voc, oov) = LmOps.trainSurprisalVocab(docs, vocabSize = 3)
    val admitted = LmOps.surprisalGate(docs, voc, oov, threshMilli = 2000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val notLow = LmOps.surprisalScores(docs, vocabSize = 3, threshMilli = 2000)
      .filter(!col("low_quality"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == notLow)
    assert(admitted.nonEmpty && admitted != docs.collect().map(_.getLong(0)).toSet,
      "parity test must have both admitted and dropped docs")
  }

  test("surprisal gate: pure predicate runs in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val trainDocs = Seq((0L, "x x x x y y")).toDF("doc_id", "text")
    val (voc, oov) = LmOps.trainSurprisalVocab(trainDocs, vocabSize = 2)
    val stream = MemoryStream[(Long, String)]
    val q = LmOps.surprisalGate(
      // vocab from train: x→0 bits, y→1 bit, OOV→bitLen(6)=2 bits;
      // 1.5 bits/token splits doc1 (1/3 bit) from all-OOV doc2 (2 bits)
      stream.toDS().toDF("doc_id", "text"), voc, oov, threshMilli = 1500)
      .writeStream.format("memory").queryName("gate_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, "x x y"), (2L, "unseen unseen"), (3L, ""))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM gate_out")
        .collect().map(_.getLong(0)).toSet
      // doc1: in-vocab mix under threshold; doc2 all-OOV over it; doc3 empty
      assert(got == Set(1L))
    } finally q.stop()
  }

  test("bigram gate: batch parity with the q133 low_quality flag") {
    val docs = Seq(
      (1L, "x y x y x y"), (2L, "x z q q"), (3L, ""), (4L, "solo"),
      (5L, "q q q q"), (6L, "x y x y"))
      .toDF("doc_id", "text")
    val (big, uni, oov) = LmOps.trainBigramVocab(docs, bigramVocab = 2,
      unigramVocab = 2)
    for (thresh <- Seq(500L, 2000L, 3500L)) {
      val admitted = LmOps.bigramSurprisalGate(docs, big, uni, oov, thresh)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val notLow = LmOps.bigramSurprisalScores(docs, bigramVocab = 2,
        unigramVocab = 2, threshMilli = thresh)
        .filter(!col("low_quality"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == notLow, s"thresh=$thresh: $admitted vs $notLow")
    }
    // the parity corpus must exercise bigram hits, backoff, OOV, and
    // the no-bigram degenerate docs
    assert(big.nonEmpty && uni.nonEmpty)
  }

  test("bigram gate: pure predicate runs in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val trainDocs = Seq((0L, "x y x y x y x z")).toDF("doc_id", "text")
    val (big, uni, oov) = LmOps.trainBigramVocab(trainDocs, 2, 2)
    val stream = MemoryStream[(Long, String)]
    val q = LmOps.bigramSurprisalGate(
      stream.toDS().toDF("doc_id", "text"), big, uni, oov,
      threshMilli = 1500)
      .writeStream.format("memory").queryName("bigate_out")
      .outputMode("append").start()
    try {
      stream.addData((1L, "x y x y"), (2L, "unseen unseen unseen"), (3L, "x"))
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM bigate_out")
        .collect().map(_.getLong(0)).toSet
      // doc1 rides the trained bigrams; doc2 is all-OOV; doc3 has no
      // bigram positions
      assert(got == Set(1L))
    } finally q.stop()
  }

  test("surprisal gate: per-row cost flat at a 50k-entry vocabulary") {
    // The deployment-scale law for VocabSurprisalSumExpr: a CCNet-sized
    // vocabulary must cost the same per token as a toy one (hash
    // lookup), where the old literal-map element_at probe paid O(vocab)
    // comparisons per token — 5e9 comparisons on this corpus at 50k,
    // minutes vs milliseconds. Correctness at both sizes is checked
    // against a plain-JVM recomputation with the same map.
    val rnd = new scala.util.Random(7)
    val docs = (1L to 1000L).map { id =>
      (id, (0 until 100).map(_ => s"t${rnd.nextInt(200)}").mkString(" "))
    }.toDF("doc_id", "text")
    def vocabOf(n: Int): Map[String, Long] =
      (0 until n).map(i => s"t$i" -> (i % 7).toLong).toMap
    def expected(voc: Map[String, Long], oov: Long, thresh: Long): Set[Long] =
      docs.collect().map(r => (r.getLong(0), r.getString(1))).filter {
        case (_, text) =>
          val ts = text.split("\\s+").filter(_.nonEmpty)
          val total = ts.map(t => voc.getOrElse(t, oov)).sum
          ts.nonEmpty && total * 1000L <= thresh * ts.length
      }.map(_._1).toSet
    def run(voc: Map[String, Long]): (Set[Long], Long) = {
      val gate = LmOps.surprisalGate(docs, voc, oovSb = 13L, threshMilli = 4200)
      gate.count() // warm: plan + codegen + scan cached out of the timing
      val t0 = System.nanoTime()
      val got = gate.select("doc_id").collect().map(_.getLong(0)).toSet
      (got, System.nanoTime() - t0)
    }
    val small = vocabOf(100)
    val big = vocabOf(50000)
    // structural pin first: the gate must probe through the native
    // expression, never an element_at scan over a literal map (checked
    // on the ANALYZED plan — the optimizer constant-folds this local
    // test relation away entirely, which is itself fine)
    val plan = LmOps.surprisalGate(docs, big, 13L, 4200L)
      .queryExecution.analyzed.toString
    assert(plan.contains("vocab_surprisal_sum"), s"probe lost the kernel:\n$plan")
    assert(!plan.contains("element_at"), s"literal-map scan returned:\n$plan")
    val (gotSmall, tSmall) = run(small)
    val (gotBig, tBig) = run(big)
    assert(gotSmall == expected(small, 13L, 4200L))
    assert(gotBig == expected(big, 13L, 4200L))
    assert(gotSmall != gotBig, "sizes must actually change admissions here")
    // flat-cost bound: generous (job overhead dominates both, and a GC
    // pause must not flake the suite) but far below the O(vocab)
    // probe's 500x signature
    assert(tBig <= 5 * tSmall + 2000L * 1000 * 1000,
      s"50k vocab gate took ${tBig / 1e6} ms vs ${tSmall / 1e6} ms at 100")
  }

  // ---------------------------------------------------------------- q128

  test("importance: target-like docs weigh above off-target docs") {
    val target = "alpha beta alpha beta alpha beta"
    val docs = Seq(
      (1L, target, "tgt"),
      (2L, "alpha beta alpha beta", "other"), // same grams as target
      (3L, "gamma delta gamma delta", "other")) // disjoint grams
      .toDF("doc_id", "text", "source")
    val out = LmOps.importanceWeights(docs, col("source") === "tgt",
      keepThreshold = 0L).orderBy("doc_id").collect()
    val w = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_sum")).toMap
    val nf = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_feats")).toMap
    assert(nf(1L) == 5 && nf(2L) == 3 && nf(3L) == 3) // n-1 grams each
    // doc 2 shares the target's grams; doc 3 shares none — per-FEATURE
    // weight must be strictly higher for target-covered grams.
    assert(w(2L).toDouble / nf(2L) > w(3L).toDouble / nf(3L))
  }

  test("importance: every doc gets a row (empty doc = single '' gram)") {
    val docs = Seq((1L, "a b", "t"), (2L, "", "u")).toDF("doc_id", "text", "source")
    val out = LmOps.importanceWeights(docs, col("source") === "t")
    assert(out.count() == 2)
    assert(out.filter(col("doc_id") === 2).collect()(0).getAs[Long]("n_feats") == 1)
  }

  test("contrast: hand-computed two-model difference with per-model OOV") {
    // target corpus (src=tgt): "x x y" + "x z" → x:3, y:1, z:1, Nt=5
    // background (src=bg): "z z z" → z:3, Nb=3
    // vocabSize=2: vocT = {x: bitLen(5/3)=0, y: bitLen(5/1)=2}, oovT=2
    //              vocB = {z: bitLen(3/3)=0} (only z has cb>0), oovB=1
    // dv: x = 0-1 = -1, y = 2-1 = 1, z = 2-0 = 2
    val docs = Seq(
      (1L, "x x y", "tgt"), (2L, "x z", "tgt"),
      (3L, "z z z", "bg"), (4L, "", "bg"))
      .toDF("doc_id", "text", "source")
    val out = LmOps.contrastScores(docs, col("source") === "tgt",
      vocabSize = 2, threshMilli = 0L).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("contrast") == 2 * -1 + 1 * 1) // -1
    assert(out(0).getAs[Boolean]("keep"))
    assert(out(1).getAs[Long]("contrast") == -1 + 2) // 1
    assert(!out(1).getAs[Boolean]("keep"))
    assert(out(2).getAs[Long]("contrast") == 3 * 2) // 6
    assert(!out(2).getAs[Boolean]("keep"))
    assert(out(3).getAs[Long]("n_tokens") == 0)
    assert(!out(3).getAs[Boolean]("keep")) // empty ⇒ never kept
  }

  // ----------------------------------------------------------- BPE train

  test("bpe: distributed trainer equals the sequential witness") {
    val hist = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("table", 4L), ("batch", 2L), ("hash", 7L))
    val distributed = LmOps.bpeTrain(hist.toDF("word", "n"), maxMerges = 12)
    val witness = LmOps.bpeTrainWitness(hist, maxMerges = 12)
    assert(distributed == witness)
    assert(distributed.nonEmpty)
    // counts must be frequency-weighted: 'es' pair appears in newest(6)
    // and widest(3) = 9 — the classic textbook first merge for this set.
    assert(distributed.head.pairCount >= 9)
  }

  test("bpe: tie-break is deterministic (count desc, a asc, b asc)") {
    // 'ab' and 'cd' both occur twice; (a, b) < (c, d) must win rank 1.
    val hist = Seq(("ab", 2L), ("cd", 2L))
    val w = LmOps.bpeTrainWitness(hist, maxMerges = 1)
    assert(w.head.a == "a" && w.head.b == "b")
    val d = LmOps.bpeTrain(hist.toDF("word", "n"), maxMerges = 1)
    assert(d == w)
  }

  test("bpe: merge fold is non-overlapping left-to-right (a a a → aa a)") {
    // witness and distributed must both merge greedily without overlap
    val hist = Seq(("aaa", 1L))
    val d = LmOps.bpeTrain(hist.toDF("word", "n"), maxMerges = 3,
      minPairCount = 1L)
    val w = LmOps.bpeTrainWitness(hist, maxMerges = 3, minPairCount = 1L)
    // pass 1 on [a,a,a]: pairs (a,a)x2 → merge → [aa, a];
    // pass 2: (aa, a) x1 → merge → [aaa]; then no pairs remain.
    assert(w.map(m => (m.a, m.b, m.pairCount)) ==
      Seq(("a", "a", 2L), ("aa", "a", 1L)))
    assert(d == w)
  }

  test("bpe: stops when best pair drops below minPairCount") {
    val hist = Seq(("ab", 1L), ("cd", 1L))
    assert(LmOps.bpeTrainWitness(hist, maxMerges = 5).isEmpty) // min 2
    assert(LmOps.bpeTrain(hist.toDF("word", "n"), maxMerges = 5).isEmpty)
    assert(LmOps.bpeTrainFast(hist.toDF("word", "n"), maxMerges = 5)._1.isEmpty)
  }

  test("bpe fast: batched incremental trainer equals the witness, fewer jobs") {
    val hist = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("table", 4L), ("batch", 2L), ("hash", 7L))
    val (fast, stats) = LmOps.bpeTrainFast(hist.toDF("word", "n"),
      maxMerges = 12, minPairCount = 1L)
    val witness = LmOps.bpeTrainWitness(hist, maxMerges = 12,
      minPairCount = 1L)
    assert(fast == witness)
    assert(stats.merges == fast.size)
    assert(stats.sparkJobs == stats.batches + 1, "one job per batch + seed")
    // (batch-size > 1 on a corpus this small and letter-entangled is not
    // guaranteed — BpeScaleWitness carries the jobs << merges evidence)
  }

  test("bpe fast: adversarial random-histogram law vs the witness") {
    // The q130 lesson applied to the trainer: the corpus never volunteers
    // the interference counterexamples, so generate them. A 4-letter
    // alphabet maximizes batch hazards — shared symbols between top
    // candidates, a==b self-pairs, merged-symbol STRING collisions with
    // surviving single letters (the "ab" + "a b" case), and count ties
    // resolved by the UTF-8 order. Any unsound batch prefix diverges
    // from the sequential witness within a few merges.
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 12) {
      val alpha = "abcd"
      val hist = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(10)
        (Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString,
          1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val merges = 1 + rnd.nextInt(24)
      val (fast, _) = LmOps.bpeTrainFast(hist.toDF("word", "n"),
        maxMerges = merges, minPairCount = 1L)
      val wit = LmOps.bpeTrainWitness(hist, maxMerges = merges,
        minPairCount = 1L)
      assert(fast == wit,
        s"trial $trial diverged (merges=$merges):\n fast=$fast\n  wit=$wit\n hist=$hist")
    }
  }

  test("bpe encode: hand-computed vocabulary ids and sequence checksum") {
    import graft.functions.BpeEncodeExpr
    // alphabet {a, b} → a=0, b=1; merge (a,b) → "ab"=2.
    // "ab ba" → [ab][b, a] → ids 2, 1, 0 (order matters).
    val merges = Seq(LmOps.BpeMerge(1, "a", "b", "ab", 9L))
    val vocab = LmOps.bpeVocabIds(Seq("b", "a"), merges) // order-insensitive
    assert(vocab == Map("a" -> 0, "b" -> 1, "ab" -> 2))
    val docs = Seq((1L, "ab ba"), (2L, "")).toDF("doc_id", "text")
    val out = LmOps.bpeEncodeReport(docs, Seq("a" -> "b"), vocab)
      .orderBy("doc_id").collect()
    val expect = ((BpeEncodeExpr.ChecksumOffset * BpeEncodeExpr.ChecksumPrime
      + 3L) * BpeEncodeExpr.ChecksumPrime + 2L) *
      BpeEncodeExpr.ChecksumPrime + 1L
    assert(out(0).getAs[Long]("n_ids") == 3L)
    assert(out(0).getAs[Long]("checksum") == expect)
    assert(expect == BpeEncodeExpr.checksum(Seq(2, 1, 0)),
      "driver fold and kernel must share the checksum contract")
    assert(out(1).getAs[Long]("n_ids") == 0L)
    assert(out(1).getAs[Long]("checksum") == BpeEncodeExpr.ChecksumOffset)
  }

  test("bpe vocab ids: first-rank wins on merged-string collision") {
    // ("ab","c") at rank 2 and ("a","bc") at rank 3 both merge to "abc":
    // rank 2's id (base 3 + rank 2 - 1 = 4) wins; rank 3's slot id 5 is
    // unused. A merged string equal to a base symbol keeps the base id.
    val merges = Seq(
      LmOps.BpeMerge(1, "a", "b", "ab", 9L),
      LmOps.BpeMerge(2, "ab", "c", "abc", 8L),
      LmOps.BpeMerge(3, "a", "bc", "abc", 7L),
      LmOps.BpeMerge(4, "", "c", "c", 6L)) // degenerate: collides with base
    val vocab = LmOps.bpeVocabIds(Seq("a", "b", "c"), merges)
    assert(vocab == Map("a" -> 0, "b" -> 1, "c" -> 2, "ab" -> 3, "abc" -> 4))
  }

  // ----------------------------------------------------------- BPE apply

  test("bpe apply: fixed-table symbol counts match hand derivation") {
    // FixedMerges chains: table→[tab,l,e]=3, hash→[has,h]=2,
    // batch→[bat,c,h]=3, agg→[agg]=1, scan→[sca,n]=2 (s c→sc, sc a→sca).
    val docs = Seq((1L, "table hash batch agg scan")).toDF("doc_id", "text")
    val out = LmOps.bpeApplyReport(docs).collect()(0)
    assert(out.getAs[Long]("n_words") == 5)
    assert(out.getAs[Long]("n_subwords") == 3 + 2 + 3 + 1 + 2)
  }

  test("bpe apply: empty doc keeps a (0, 0) row") {
    val docs = Seq((1L, "x"), (2L, " ")).toDF("doc_id", "text")
    val out = LmOps.bpeApplyReport(docs).orderBy("doc_id").collect()
    assert(out(1).getAs[Long]("n_words") == 0)
    assert(out(1).getAs[Long]("n_subwords") == 0)
  }

  test("bpe roundtrip: distributed train + chain apply == witness train + scan apply") {
    val docs = Seq(
      (1L, "lower newest table hash"), (2L, "newest newest widest low"),
      (3L, "")).toDF("doc_id", "text")
    val hist = LmOps.wordHistogram(docs)
    val distMerges = LmOps.bpeTrain(hist, maxMerges = 10, minPairCount = 1L)
    val witMerges = LmOps.bpeTrainWitness(
      hist.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq,
      maxMerges = 10, minPairCount = 1L)
    assert(distMerges == witMerges)
    val chainApplied = LmOps.bpeApplyReport(docs,
      merges = distMerges.map(m => (m.a, m.b)))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val scanApplied = docs.collect().map { r =>
      val words = r.getString(1).split("\\s+").filter(_.nonEmpty)
      (r.getLong(0), words.length.toLong,
        words.map(w => LmOps.applyMergesScan(w,
          witMerges.map(m => (m.a, m.b))).toLong).sum)
    }.sortBy(_._1)
    assert(chainApplied.toSeq == scanApplied.toSeq)
  }

  test("bpe apply: fold follows scan semantics on chained and alternating runs") {
    // (a,g) then (ag,g): "aggg" → [ag,g,g] → [agg, g] = 2.
    val docs = Seq((1L, "aggg")).toDF("doc_id", "text")
    val out = LmOps.bpeApplyReport(docs).collect()(0)
    assert(out.getAs[Long]("n_subwords") == 2) // [agg, g]
    // the alternating-pair case a single replace pass gets WRONG (the
    // second ' t a ' loses its shared delimiter space): "tata" must
    // merge BOTH pairs under rule (t,a) → [ta, ta] = 2.
    val alt = Seq((1L, "tata tatata")).toDF("doc_id", "text")
    val r = LmOps.bpeApplyReport(alt).collect()(0)
    // tata → [ta, ta] = 2; tatata → [ta, ta, ta] = 3
    assert(r.getAs[Long]("n_subwords") == 5)
  }

  test("KN bigram model: rationals match a sequential witness and sum to exactly 1 per context") {
    val texts = Seq("a b a b c", "b a b b c a", "c a b a a",
      "a b c b a b", "b c a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // sequential witness: sliding bigrams, plain maps
    val bigrams = texts.flatMap(_.split("\\s+").filter(_.nonEmpty)
      .sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
    val c2 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cv = c2.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val nv = c2.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val n1w = c2.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val bigN = c2.size.toLong
    val got = LmOps.knBigramModel(df, topK = 1000).collect()
    assert(got.length == c2.size, "topK above vocab must return every bigram")
    got.foreach { r =>
      val (v, w) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == c2((v, w)) && r.getLong(3) == cv(v) &&
        r.getLong(4) == nv(v) && r.getLong(5) == n1w(w) &&
        r.getLong(6) == bigN, s"counts diverged at ($v,$w)")
      val num = BigInt(4 * c2((v, w)) - 3) * bigN +
        BigInt(3) * nv(v) * n1w(w)
      val den = BigInt(4) * cv(v) * bigN
      assert(r.getLong(7) == (num * 1000 / den).toLong,
        s"p_milli diverged at ($v,$w)")
      assert(r.getLong(8) == (den / num).toLong.toBinaryString.length - 1,
        s"sb diverged at ($v,$w)")
    }
    // the scorer's accounting on the same corpus: every doc's total is
    // Σ k·sb over in-model bigrams + k·(bitLen(N)+2) over the rest
    val sbOf = got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(8))
      .toMap
    val oov = bigN.toBinaryString.length - 1 + 2L
    val scores = LmOps.knSurprisalScores(df, topK = 1000,
      threshMilli = 4000L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val bs = t.split("\\s+").filter(_.nonEmpty).sliding(2)
        .filter(_.length == 2).map(p => (p(0), p(1))).toSeq
      val expTotal = bs.map(b => sbOf.getOrElse(b, oov)).sum
      assert(scores(i.toLong) == (bs.size.toLong, expTotal),
        s"doc $i scoring diverged")
    }
    // THE KN normalization law, exact: for every context v,
    // Σ_{w ∈ cont(v)} [(4c−3)N + 3·nv·n1w] + Σ_{w ∉ cont(v)} 3·nv·n1w
    // == 4·cv·N (the backoff mass completes the simplex exactly)
    val vocab = n1w.keySet
    cv.keys.foreach { v =>
      val inModel = vocab.filter(w => c2.contains((v, w))).toSeq.map { w =>
        BigInt(4 * c2((v, w)) - 3) * bigN + BigInt(3) * nv(v) * n1w(w)
      }.sum
      val backoff = vocab.filterNot(w => c2.contains((v, w))).toSeq
        .map(w => BigInt(3) * nv(v) * n1w(w)).sum
      assert(inModel + backoff == BigInt(4) * cv(v) * bigN,
        s"KN mass for context '$v' does not sum to 1")
    }
  }

  test("KN scorer: zero-bigram docs flag low_quality (the q127/q133 stance)") {
    val docs = Seq((1L, "a b a b"), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = LmOps.knSurprisalScores(docs, topK = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3)))
      .toMap
    assert(got(2L) == ((0L, true)) && got(3L) == ((0L, true)),
      s"no-signal docs must flag: $got")
    assert(!got(1L)._2, s"in-model doc must pass: $got")
  }

  test("KN gate: batch parity with the q201 low_quality flag") {
    // toy corpus, three thresholds straddling the split — model hits,
    // out-of-model bigrams, and the no-bigram degenerates
    val docs = Seq(
      (1L, "x y x y x y"), (2L, "x z q q"), (3L, ""), (4L, "solo"),
      (5L, "q q q q"), (6L, "x y x y"))
      .toDF("doc_id", "text")
    val (kn, oov) = LmOps.trainKnVocab(docs, topK = 3)
    assert(kn.nonEmpty)
    for (thresh <- Seq(500L, 4000L, 9000L)) {
      val admitted = LmOps.knSurprisalGate(docs, kn, oov, thresh)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val notLow = LmOps.knSurprisalScores(docs, topK = 3,
        threshMilli = thresh)
        .filter(!col("low_quality"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == notLow, s"thresh=$thresh: $admitted vs $notLow")
    }
  }

  test("KN gate: parity holds on the real corpus at two scale factors") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("doc_id"), col("text"))
      val (kn, oov) = LmOps.trainKnVocab(docs, topK = 64)
      val admitted = LmOps.knSurprisalGate(docs, kn, oov,
        threshMilli = 10200L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val notLow = LmOps.knSurprisalScores(docs, topK = 64,
        threshMilli = 10200L)
        .filter(!col("low_quality"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == notLow,
        s"$sf: extra=${admitted -- notLow} missing=${notLow -- admitted}")
      // the corpus-tuned knob must actually split this corpus
      assert(admitted.nonEmpty && notLow.size < docs.count(), sf)
    }
  }

  // ----------------------------------- Min-K% membership probe (q210)

  test("mink: hand-computed top-k selection on a controlled model") {
    // model: bigram "a b" -> 2 bits, unigram backoff b -> 5, OOV 9.
    // doc "a b q b a b z z": bigrams (a b)=2, (b q)=oov 9? cur=q OOV 9,
    // (q b)=uni(b) 5, (b a)=OOV 9 (cur=a not in uni), (a b)=2,
    // (b z)=9, (z z)=9 -> surprisals [2,9,5,9,2,9,9], nb=7,
    // k=ceil(0.2*7)=2 -> top2 = 9+9=18; pct=1000 -> k=7 -> sum=45.
    val big = Map("a b" -> 2L)
    val uni = Map("b" -> 5L)
    val docs = Seq((1L, "a b q b a b z z"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val out = LmOps.minkScoresWith(docs, big, uni, oovSb = 9L,
      pctMilli = 200L, threshMilli = 5000L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(out(1L) == ((7L, 2L, 18L, false)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 0L, false)))
    assert(out(3L) == ((0L, 0L, 0L, false)))
    val full = LmOps.minkScoresWith(docs, big, uni, oovSb = 9L,
      pctMilli = 1000L, threshMilli = 5000L).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(full(1L) == 45L, s"pct=100% sum: ${full(1L)}")
  }

  test("mink law: pct=100% equals the full bigram surprisal sum on the fixture") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (big, uni, oov) = LmOps.trainBigramVocab(docs,
      bigramVocab = 512, unigramVocab = 64)
    val mink = LmOps.minkScoresWith(docs, big, uni, oov,
      pctMilli = 1000L, threshMilli = 0L)
      .select("doc_id", "mink_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = docs.select(col("doc_id"),
      graft.functions.BigramSurprisalSumExpr.of(
        graft.functions.TextFunctions.tokens(col("text")), big, uni, oov)
        .as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mink == full,
      s"diverging: ${mink.keySet.filter(k => mink(k) != full(k)).take(5)}")
  }

  test("mink gate: parity with the batch member flag, tuned knob splits") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (big, uni, oov) = LmOps.trainBigramVocab(docs,
      bigramVocab = 512, unigramVocab = 64)
    val admitted = LmOps.minkGate(docs, big, uni, oov,
      pctMilli = 200L, threshMilli = 5000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nonMembers = LmOps.minkScoresWith(docs, big, uni, oov,
      pctMilli = 200L, threshMilli = 5000L)
      .filter(!col("member"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == nonMembers,
      s"extra=${admitted -- nonMembers} missing=${nonMembers -- admitted}")
    // the tuned knob must actually split this corpus (209/291 measured)
    assert(admitted.nonEmpty && admitted.size < docs.count())
  }

  // ------------------------------------ word2vec phrase mining (q208/q209)

  test("pmi collocations: hand-computed score, discount, and signed PMI bucket") {
    // 4×"new york" + "new day" + "big york": c2(new,york)=4,
    // c1(new)=c1(york)=5, N=12 tokens, N2=6 bigrams.
    // score = (4−1)·12·1000/25 = 1440; PMI ratio = 4·12²/(6·25) = 3.84
    // → bucket bitLen(3) = 1. minCount=3 keeps only (new, york).
    val docs = (Seq.fill(4)("new york") ++ Seq("new day", "big york"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = LmOps.pmiCollocations(docs, minCount = 3L, delta = 1L,
      topN = 10).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "new" && r.getString(1) == "york")
    assert(r.getLong(2) == 4L && r.getLong(3) == 5L && r.getLong(4) == 5L)
    assert(r.getLong(5) == 12L && r.getLong(6) == 6L)
    assert(r.getLong(7) == 1440L, s"score_milli: ${r.getLong(7)}")
    assert(r.getLong(8) == 1L, s"pmi_bit: ${r.getLong(8)}")
  }

  test("pmi collocations: negative-PMI pair gets a negative signed bucket") {
    // "a b" rare relative to huge marginals: 16 docs "a x", 16 docs
    // "y b", 3 docs "a b": c1(a)=19, c1(b)=19, c2(a,b)=3, N=70, N2=35.
    // PMI ratio = 3·70²/(35·19²) = 14700/12635 ≥ 1 — adjust: make the
    // marginals bigger. 32+32+3 docs: c1(a)=35, c1(b)=35, N=134, N2=67,
    // ratio = 3·134²/(67·35²) = 53868/82075 < 1 → den//num = 1 →
    // bucket −0; push further: 64 each side → c1=67, N=262, N2=131,
    // ratio = 3·262²/(131·67²) = 205932/588059 → den//num = 2 →
    // bucket −1.
    val docs = (Seq.fill(64)("a x") ++ Seq.fill(64)("y b") ++
      Seq.fill(3)("a b")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = LmOps.pmiCollocations(docs, minCount = 3L, delta = 1L,
      topN = 100).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(8)).toMap
    assert(out(("a", "b")) == -1L, s"signed bucket: $out")
  }

  test("phrase merge: greedy scan on adversarial overlap chains, hand-pinned") {
    val phrases = Seq(("a", "a"), ("a", "b"), ("b", "a"))
    val docs = Seq(
      (1L, "a a a a a"), // run of 4 matching positions -> 2 merges
      (2L, "a b a b a"), // alternating chain, run of 4 -> 2 merges
      (3L, "x a b a b y"), // positions 1..3 all match (a b / b a / a b): run 3 -> 2
      (4L, "a b"), // single pair -> 1
      (5L, "solo"), // no pairs
      (6L, ""), // empty
      (7L, "x y z") // pairs, no matches
    ).toDF("doc_id", "text")
    val out = LmOps.phraseMergeReport(docs, phrases).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out(1L) == ((5L, 4L, 2L, 3L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((5L, 4L, 2L, 3L)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((6L, 3L, 2L, 4L)), s"doc3: ${out(3L)}")
    assert(out(4L) == ((2L, 1L, 1L, 1L)), s"doc4: ${out(4L)}")
    assert(out(5L) == ((1L, 0L, 0L, 1L)))
    assert(out(6L) == ((0L, 0L, 0L, 0L)))
    assert(out(7L) == ((3L, 0L, 0L, 3L)))
  }

  test("phrase merge law: expression scan == gaps-and-islands runs form") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val phrases = LmOps.pmiCollocations(docs, minCount = 3L, delta = 1L,
      topN = 20).collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(phrases.nonEmpty, "fixture must yield a phrase table")
    val scan = LmOps.phraseMergeReport(docs, phrases)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val runs = LmOps.phraseMergeRunsForm(docs, phrases)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(scan == runs,
      s"diverging docs: ${scan.keySet.filter(k => scan(k) != runs.get(k).orNull).take(5)}")
    assert(scan.values.map(_._3).sum > 0, "law must exercise real merges")
  }
}
