package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** BM25 retrieval invariants: the distributed postings-join scorer
  * equals a plain sequential witness (same pinned arithmetic, no shared
  * mechanism); champion-list pruning bounds candidates without changing
  * any surviving candidate's score; the sf0.001 corpus retrieves with
  * high pruned-vs-full overlap. */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("retrieval-spec", "4").getOrCreate()
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick red fox runs fast"),
    (2L, "lazy dog sleeps all day the dog snores"),
    (3L, "brown bears eat fish the quick bear"),
    (4L, "a completely unrelated sentence about spark engines"),
    (5L, "fox fox fox den"),
    (6L, ""),
    (7L, "the the the the"),
    (8L, "quick quick dog")
  )

  /** Sequential witness: tokenize → tf/dl/df → the exact q153 weight
    * shape, terms summed ascending. Plain maps and loops. */
  private def witnessTopK(corpus: Seq[(Long, String)], queryIds: Seq[Long],
      kTop: Int): Map[Long, Seq[(Long, Double)]] = {
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val tf: Map[(Long, String), Long] = corpus.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => ((id, w), g.size.toLong) }
    }.toMap
    val dl: Map[Long, Long] =
      tf.toSeq.groupBy(_._1._1).map { case (id, g) => id -> g.map(_._2).sum }
    val df: Map[String, Long] =
      tf.keys.toSeq.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val nd = corpus.size.toLong
    val avgdl = dl.values.sum.toDouble / nd.toDouble
    queryIds.map { qid =>
      val qts = corpus.toMap.apply(qid)
      val terms = toks(qts).distinct.sorted
      val scored = corpus.collect { case (did, _)
          if did != qid && terms.exists(t => tf.contains((did, t))) =>
        var acc = 0.0
        terms.foreach { t =>
          tf.get((did, t)).foreach { f =>
            val idf = (nd * 1000L) / df(t)
            acc += idf.toDouble * ((f.toDouble * 2.2) /
              (f.toDouble + 1.2 * (0.25 + 0.75 * (dl(did).toDouble / avgdl))))
          }
        }
        (did, acc)
      }
      qid -> scored.sortBy { case (did, sc) => (-sc, did) }.take(kTop)
    }.toMap
  }

  test("distributed BM25 equals the sequential witness to the last ulp") {
    val df = docs.toDF("doc_id", "text")
    val post = Retrieval.postings(df)
    val (nd, avgdl) = Retrieval.corpusStats(df, post)
    val queries = df.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text"))
    val got = Retrieval.bm25TopK(post, queries, nd, avgdl, kTop = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    val want = witnessTopK(docs, Seq(0L, 1L, 2L), 5)
    assert(got.keySet == want.keySet)
    want.foreach { case (q, exp) =>
      assert(got(q) == exp, s"query $q: ${got(q)} vs witness $exp")
    }
  }

  test("two-phase pruning: bounded candidates, exact surviving scores") {
    val df = docs.toDF("doc_id", "text")
    val post = Retrieval.postings(df).persist()
    val (nd, avgdl) = Retrieval.corpusStats(df, post)
    val champs = Retrieval.championPostings(post, c = 2, avgdl)
    // the champion bound: no term keeps more than c postings
    val maxPer = champs.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxPer <= 2)
    val queries = df.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text"))
    val full = Retrieval.bm25TopK(post, queries, nd, avgdl, kTop = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pruned = Retrieval
      .bm25TopKPruned(post, queries, nd, avgdl, kTop = 20, c = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // second phase is EXACT: every emitted pair carries the full run's
    // score to the last ulp (candidates only restrict WHICH docs score)
    assert(pruned.nonEmpty)
    pruned.foreach { case (k, sc) =>
      assert(full.contains(k), s"pruned produced a pair full lacks: $k")
      assert(sc == full(k), s"$k pruned $sc != full ${full(k)}")
    }
    // per-query candidate bound: |query terms| x c (query 0 has 8
    // distinct terms, c = 2 -> at most 16 scored docs)
    pruned.keys.groupBy(_._1).foreach { case (q, ks) =>
      assert(ks.size <= 8 * 2, s"query $q scored ${ks.size} docs > bound")
    }
    // doc 5 ("fox fox fox") is the fox champion list's head, so query 1
    // ("the quick red fox runs fast") must retrieve it, exactly
    assert(pruned((1L, 5L)) == full((1L, 5L)))
    post.unpersist(false)
  }

  test("sf0.001 corpus: ranks contiguous, pruned overlap@10 high") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.core.Tables(spark, dir).documents
    val post = Retrieval.postings(df).persist()
    val (nd, avgdl) = Retrieval.corpusStats(df, post)
    val queries = df.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.functions.TextFunctions.tokens(col("text")),
          1, 8), " ").as("text"))
    val full = Retrieval.bm25TopK(post, queries, nd, avgdl, kTop = 10)
      .collect()
    assert(full.nonEmpty)
    full.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(3)).sorted
      assert(ranks.toSeq == (1 to rs.length).toSeq, s"query $q ranks: $ranks")
    }
    val pruned = Retrieval
      .bm25TopKPruned(post, queries, nd, avgdl, kTop = 10)
      .collect()
    val fullSets = full.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val prunedSets = pruned.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val overlaps = fullSets.map { case (q, fs) =>
      val ps = prunedSets.getOrElse(q, Set.empty[Long])
      fs.intersect(ps).size.toDouble / fs.size.toDouble
    }
    val mean = overlaps.sum / overlaps.size
    // measured 0.95 at c=64 on this worst-case (all-high-df) corpus
    assert(mean >= 0.8, s"mean pruned overlap@10 $mean < 0.8 " +
      s"(per-query: ${overlaps.toSeq.sorted.mkString(", ")})")
    post.unpersist(false)
  }

  test("certificate theorem: certified => pruned top-k equals full") {
    // a corpus WITH selectivity: term w_i appears only in docs where
    // (7d + i) mod (i+2) = 0, with tf varying 1..3 — rare terms make
    // some queries certifiable at a tiny champion budget, common ones
    // keep others honest
    val mixed = (0 until 40).map { d =>
      val words = (0 until 20).flatMap { i =>
        if ((d * 7 + i) % (i + 2) == 0) Seq.fill((d + i) % 3 + 1)(s"w$i")
        else Nil
      }
      (d.toLong, words.mkString(" "))
    }
    val df = mixed.toDF("doc_id", "text")
    val post = Retrieval.postings(df).persist()
    val (nd, avgdl) = Retrieval.corpusStats(df, post)
    val queries = df.filter(col("doc_id") < 6)
      .select(col("doc_id").as("query_id"), col("text"))
    val (k, c) = (3, 2)
    val cert = Retrieval
      .certifiedPrunedReport(post, queries, nd, avgdl, k, c)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    def ranking(d: org.apache.spark.sql.DataFrame) = d.collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(3))
          .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    val full = ranking(Retrieval.bm25TopK(post, queries, nd, avgdl, k))
    val pruned =
      ranking(Retrieval.bm25TopKPruned(post, queries, nd, avgdl, k, c))
    // the fixture must exercise BOTH branches or the theorem is vacuous
    assert(cert.values.exists(identity), s"no certified query: $cert")
    assert(cert.values.exists(!_), s"every query certified: $cert")
    cert.foreach { case (q, certified) =>
      if (certified)
        assert(pruned.getOrElse(q, Nil) == full.getOrElse(q, Nil),
          s"CERTIFIED query $q diverges: ${pruned.get(q)} vs ${full.get(q)}")
    }
    post.unpersist(false)
  }

  test("RM3: expansion terms and rescoring equal the sequential witness") {
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => ((id, w), g.size.toLong) }
    }.toMap
    val dl: Map[Long, Long] =
      tf.toSeq.groupBy(_._1._1).map { case (id, g) => id -> g.map(_._2).sum }
    val dfm: Map[String, Long] =
      tf.keys.toSeq.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val nd = docs.size.toLong
    val avgdl = dl.values.sum.toDouble / nd.toDouble
    val (kFb, mExp, kTop, lam) = (3, 2, 4, 500L)
    def tfPart(f: Long, d: Long): Double =
      (f.toDouble * 2.2) /
        (f.toDouble + 1.2 * (0.25 + 0.75 * (d.toDouble / avgdl)))
    // witness phase 1: base top-kFb, pool Σtf, exclude query terms,
    // top-mExp by (wt desc, term asc)
    val qids = Seq(0L, 1L)
    val fb = witnessTopK(docs, qids, kFb)
    val wantExp: Map[Long, Seq[(String, Long)]] = qids.map { q =>
      val qts = toks(docs.toMap.apply(q)).toSet
      val pool = fb(q).map(_._1).flatMap { d =>
        tf.collect { case ((`d`, t), f) if !qts.contains(t) => (t, f) }
      }.groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }.toSeq
      q -> pool.sortBy { case (t, wt) => (-wt, t) }.take(mExp)
    }.toMap
    // witness phase 2: expanded weights, rescore every doc
    val wantRes: Map[Long, Seq[(Long, Double)]] = qids.map { q =>
      val eq = (toks(docs.toMap.apply(q)).distinct.map(_ -> 1000L) ++
        wantExp(q).map { case (t, _) => t -> lam }).sortBy(_._1)
      val scored = docs.collect { case (did, _)
          if did != q && eq.exists { case (t, _) => tf.contains((did, t)) } =>
        var acc = 0.0
        eq.foreach { case (t, qw) =>
          tf.get((did, t)).foreach { f =>
            val idf = (nd * 1000L) / dfm(t)
            acc += qw.toDouble * (idf.toDouble * tfPart(f, dl(did)))
          }
        }
        (did, acc)
      }
      q -> scored.sortBy { case (d, sc) => (-sc, d) }.take(kTop)
    }.toMap
    val df = docs.toDF("doc_id", "text")
    val post = Retrieval.postings(df).persist()
    val (ndE, avgdlE) = Retrieval.corpusStats(df, post)
    val queries = df.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"), col("text"))
    val gotExp = Retrieval
      .rm3ExpansionTerms(post, queries, ndE, avgdlE, kFb, mExp)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(3)).map(r => (r.getString(1), r.getLong(2))).toSeq
      }
    assert(gotExp == wantExp, s"$gotExp vs $wantExp")
    val gotRes = Retrieval
      .rm3Rescored(post, queries, ndE, avgdlE, kTop, kFb, mExp, lam)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    assert(gotRes == wantRes, s"$gotRes vs $wantRes")
    post.unpersist(false)
  }

  test("phrase match: anchored-ordinal counting equals hand enumeration") {
    val df = docs.toDF("doc_id", "text")
    val pos = Retrieval.posPostings(df)
    val phrases = Seq(
      (100L, "the quick"),      // docs 0, 1, 3 — one occurrence each
      (101L, "fox fox"),        // doc 5 "fox fox fox den" — OVERLAPPING ×2
      (102L, "dog sleeps all"), // doc 2 only
      (103L, "quick dog runs")  // nowhere
    ).toDF("query_id", "text")
    val got = Retrieval.phraseMatches(pos, phrases, kTop = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .toSet
    val want = Set(
      (100L, 0L, 1L, 1L, 1), (100L, 1L, 1L, 1L, 2), (100L, 3L, 1L, 5L, 3),
      (101L, 5L, 2L, 1L, 1),
      (102L, 2L, 1L, 2L, 1))
    assert(got == want, s"$got")
  }

  test("proximity: adjacent-lag min distance equals the pairwise definition") {
    val df = docs.toDF("doc_id", "text")
    val pos = Retrieval.posPostings(df)
    val queries = Seq((200L, "quick dog"), (201L, "fox")).toDF(
      "query_id", "text")
    val got = Retrieval.proximityRank(pos, queries, kTop = 10, bucketW = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
      .toSet
    // doc 8 "quick quick dog": occurrences q@1 q@2 d@3 → min dist 1
    // doc 0: quick@2, dog@9 → 7; both single co-window (all pos < 17)
    // single-term query 201 emits nothing (no cross-term pair)
    val want = Set((200L, 8L, 1L, 1L, 1), (200L, 0L, 7L, 1L, 2))
    assert(got == want, s"$got")
    // independent pairwise-minimum witness for every conjunctive doc:
    // min over ALL cross-term occurrence pairs must equal the lag answer
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val occ = docs.flatMap { case (id, t) =>
      toks(t).zipWithIndex.collect {
        case (w, i) if Set("quick", "dog")(w) => (id, w, i + 1L)
      }
    }
    val pairMin = occ.groupBy(_._1).collect {
      case (id, os) if os.map(_._2).distinct.size == 2 =>
        id -> (for { a <- os; b <- os; if a._2 != b._2 }
          yield math.abs(a._3 - b._3)).min
    }
    assert(pairMin.toSet ==
      got.map(r => r._2 -> r._3).toSet, s"$pairMin vs $got")
  }

  test("best passage: banded window scoring equals hand enumeration") {
    val df = docs.toDF("doc_id", "text")
    val post = Retrieval.postings(df)
    val pos = Retrieval.posPostings(df)
    val queries = Seq((300L, "quick dog")).toDF("query_id", "text")
    // nd=9; df(quick)=4 → idf 2250; df(dog)=3 → idf 3000; W=4
    // doc8 "quick quick dog": window@1 holds both terms → 5250
    // doc0: quick@2, dog@9 — never both in one width-4 window → 3000@9
    // doc2: dog@2, dog@7 → 3000, EARLIEST anchor 2
    // docs 1, 3: quick only → 2250
    val got = Retrieval.bestPassages(post, pos, queries, nDocs = 9L,
      winW = 4, kTop = 10)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5)))
      .toSeq.sortBy(_._5)
    val want = Seq(
      (8L, 1L, 5250L, 2L, 1),
      (0L, 9L, 3000L, 1L, 2),
      (2L, 2L, 3000L, 1L, 3),
      (1L, 2L, 2250L, 1L, 4),
      (3L, 6L, 2250L, 1L, 5))
    assert(got == want, s"$got")
  }

  test("best passage: row-local scorer equals the banded parity witness") {
    // the r20 rewrite (per-pair pos-sorted occurrence array, anchors
    // tried row-locally) must reproduce the banded anchor×occurrence
    // join exactly — rows, scores, window starts, term counts, ranks —
    // including multi-query frames and width-1 windows (every anchor
    // scores only itself: max single idf, earliest anchor wins ties)
    val df = docs.toDF("doc_id", "text")
    val post = Retrieval.postings(df)
    val pos = Retrieval.posPostings(df)
    val queries = Seq((300L, "quick dog"), (301L, "fox lazy the"),
      (302L, "dog")).toDF("query_id", "text")
    for (w <- Seq(1, 4, 12)) {
      val got = Retrieval.bestPassages(post, pos, queries, nDocs = 9L,
        winW = w, kTop = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getInt(5))).toSet
      val want = Retrieval.bestPassagesBanded(post, pos, queries,
        nDocs = 9L, winW = w, kTop = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getInt(5))).toSet
      assert(got == want, s"winW=$w: $got vs $want")
    }
  }

  test("rankingAgreement: integer metrics equal hand computation") {
    val sys = Seq(
      (0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3), (0L, 13L, 4), (0L, 14L, 5),
      (1L, 20L, 1), (1L, 21L, 2)
    ).toDF("query_id", "doc_id", "rank")
    val rel = Seq(
      (0L, 11L), (0L, 14L), (0L, 99L), // q0: 3 relevant, hit at ranks 2, 5
      (1L, 50L),                       // q1: 1 relevant, never retrieved
      (2L, 60L)                        // q2: relevant but NO system rows
    ).toDF("query_id", "doc_id")
    val got = Retrieval.rankingAgreement(sys, rel, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    // q0: hits 2, overlap 2*1000 div 5 = 400, mrr 1000 div 2 = 500,
    //     dcg 631+387 = 1018, idcg prefix(3) = 2131 → ndcg 477
    val want = Set(
      (0L, 3L, 2L, 400L, 500L, 1018L, 1018L * 1000L / 2131L),
      (1L, 1L, 0L, 0L, 0L, 0L, 0L),
      (2L, 1L, 0L, 0L, 0L, 0L, 0L))
    assert(got == want, s"$got")
  }

  test("PostingsStore: batch deltas + compaction reproduce the monolithic index") {
    val df = docs.toDF("doc_id", "text")
    val full = Retrieval.postings(df)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-postings-spec").toString
    // three runs, each tokenizing only its own docs; compact mid-stream
    // so the load crosses a base generation AND a live delta
    Seq(0, 1).foreach { b =>
      graft.sources.PostingsStore.appendDelta(
        Retrieval.postings(df.filter(col("doc_id") % 3 === b)),
        dir, s"b$b")
    }
    assert(graft.sources.PostingsStore.compact(spark, dir) == 2)
    graft.sources.PostingsStore.appendDelta(
      Retrieval.postings(df.filter(col("doc_id") % 3 === 2)), dir, "b2")
    val loaded = graft.sources.PostingsStore.load(spark, dir)
    // row-for-row equality both ways
    assert(loaded.exceptAll(full).count() == 0)
    assert(full.exceptAll(loaded).count() == 0)
    // store-derived stats equal the corpus-derived ones (no empty docs
    // in this fixture beyond doc 6, which both sides exclude: it has no
    // postings AND storeStats counts docs with >= 1 token)
    val (nd, avgdl) = Retrieval.storeStats(loaded)
    val (ndFull, avgdlFull) = Retrieval.storeStats(full)
    assert((nd, avgdl) == (ndFull, avgdlFull))
  }

  test("PosPostingsStore: incremental positional index equals the monolith") {
    val df = docs.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("pospostings-spec").toString
    Seq(0, 1).foreach { b =>
      graft.sources.PosPostingsStore.appendDelta(
        Retrieval.posPostings(df.filter(col("doc_id") % 2 === b)),
        dir, s"b$b")
    }
    graft.sources.PosPostingsStore.compact(spark, dir)
    val got = graft.sources.PosPostingsStore.load(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = Retrieval.posPostings(df)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == want)
    // phrase retrieval through the store matches the direct index
    val phrases = Seq((100L, "the quick")).toDF("query_id", "text")
    val viaStore = Retrieval.phraseMatches(
      graft.sources.PosPostingsStore.load(spark, dir), phrases, kTop = 10)
      .collect().map(_.toSeq).toSet
    val direct = Retrieval.phraseMatches(
      Retrieval.posPostings(df), phrases, kTop = 10)
      .collect().map(_.toSeq).toSet
    assert(viaStore == direct)
  }

  test("prefixCompletions: top completions per prefix, cf ties to lower term") {
    val df = docs.toDF("doc_id", "text")
    val post = Retrieval.postings(df)
    val got = Retrieval.prefixCompletions(post, prefixLen = 3, kTop = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1)
    // "the": cf = 2+1+1+1+4 over docs 0,1,2,3,7 = 9 — its own prefix
    // bucket; "fox" cf 1+1+3 = 5
    assert(got("the").toSeq == Seq(("the", "the", 9L, 1)))
    assert(got("fox").toSeq == Seq(("fox", "fox", 5L, 1)))
    // a short term is its own (short) prefix bucket — "about"/"all"
    // bucket under "abo"/"all", not "a"
    assert(got("a").map(x => (x._2, x._4)).toSeq == Seq(("a", 1)))
    assert(got("abo").map(x => (x._2, x._4)).toSeq == Seq(("about", 1)))
    // every bucket respects kTop and rank contiguity
    got.values.foreach { rs =>
      assert(rs.length <= 2 && rs.map(_._4).sorted.toSeq ==
        (1 to rs.length).toSeq)
    }
  }

  test("indexSizeEstimate: vbyte thresholds and first-gap rule") {
    import spark.implicits._
    // crafted postings spanning the 1/2/3-byte gap thresholds
    val post = Seq(
      (0L, "t", 1L), (127L, "t", 127L), (20000L, "t", 16384L),
      (0L, "u", 1L)
    ).toDF("doc_id", "term", "tf")
    val got = Retrieval.indexSizeEstimate(post)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    // t: gaps 1 (first = doc+1), 127, 19873 → 1+1+3 = 5 bytes;
    //    tf 1, 127, 16384 → 1+1+3 = 5 bytes; 10·1000 div 3 = 3333
    // u: gap 1 → 1; tf 1 → 1; 2000
    val want = Set(
      ("t", 3L, 5L, 5L, 3333L),
      ("u", 1L, 1L, 1L, 2000L))
    assert(got == want, s"$got")
  }

  test("PosPostingsStore soak: phrase serving equals the monolith after EVERY batch") {
    val df = docs.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("pospostings-soak").toString
    val phrases = Seq((100L, "the quick"), (101L, "fox fox"))
      .toDF("query_id", "text")
    def result(index: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      Retrieval.phraseMatches(index, phrases, kTop = 10)
        .collect().map(_.toSeq).toSet
    (0 to 2).foreach { b =>
      graft.sources.PosPostingsStore.appendDelta(
        Retrieval.posPostings(df.filter(col("doc_id") % 3 === b)),
        dir, s"soak$b")
      // mid-stream compaction after the second batch — serving must be
      // oblivious to the base/delta boundary
      if (b == 1) graft.sources.PosPostingsStore.compact(spark, dir)
      val viaStore = result(
        graft.sources.PosPostingsStore.load(spark, dir))
      val monolith = result(
        Retrieval.posPostings(df.filter(col("doc_id") % 3 <= b)))
      assert(viaStore == monolith, s"batch $b diverged")
    }
  }

  test("collapseNearDups keeps the best rank per cluster and closes gaps") {
    val ranking = Seq(
      (0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3), (0L, 4L, 4),
      (1L, 5L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val fps = Seq(
      (1L, "A"), (2L, "A"), (3L, "B"), (4L, "A"), (5L, "C")
    ).toDF("doc_id", "fp")
    val got = Retrieval.collapseNearDups(ranking, fps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3))).toSet
    // q0: docs 2 and 4 collapse into doc 1's A-cluster; doc 3 moves up
    val want = Set((0L, 1L, 1, 1), (0L, 3L, 3, 2), (1L, 5L, 1, 1))
    assert(got == want, s"$got")
  }

  test("spellSuggest: deletion-join candidates, exact verify, cf ranking") {
    val df = docs.toDF("doc_id", "text")
    val post = Retrieval.postings(df)
    val tokens = Seq("qick", "foxx", "zzzz").toDF("token")
    val got = Retrieval.spellSuggest(post, tokens, kTop = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getInt(4))).toSet
    // qick → quick (substitution... deletion-share via "qick"→"qick"
    // variants ∩ "quick" deletions = "qick"); cf(quick) = 1+1+1+2 = 5
    // foxx → fox (cf 1+1+3 = 5); zzzz matches nothing
    val want = Set(
      ("qick", "quick", 1, 5L, 1),
      ("foxx", "fox", 1, 5L, 1))
    assert(got == want, s"$got")
  }

  test("redactPhrases masks exactly the matched spans, overlaps union") {
    val df = docs.toDF("doc_id", "text")
    val pos = Retrieval.posPostings(df)
    val blocklist = Seq((100L, "the quick"), (101L, "fox fox"))
      .toDF("query_id", "text")
    val got = Retrieval.redactPhrases(df, pos, blocklist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val want = Set(
      (0L, 2L, "___ ___ brown fox jumps over the lazy dog"),
      (1L, 2L, "___ ___ red fox runs fast"),
      (3L, 2L, "brown bears eat fish ___ ___ bear"),
      // overlapping "fox fox" at anchors 1 and 2 → positions {1,2,3}
      (5L, 3L, "___ ___ ___ den"))
    assert(got == want, s"$got")
  }

  test("combFuse: min-max normalization, MNZ boost, constant-score guard") {
    val lex = Seq(
      (0L, 1L, 10.0), (0L, 2L, 5.0), (0L, 3L, 0.0),
      (1L, 7L, 4.0), (1L, 8L, 4.0) // constant scores → norms 0
    ).toDF("query_id", "doc_id", "score")
    val dense = Seq((0L, 2L, 2.0), (0L, 4L, 1.0))
      .toDF("query_id", "doc_id", "score")
    val got = Retrieval.combFuse(Seq("lex" -> lex, "dense" -> dense),
      kTop = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getInt(5))).toSet
    // q0: d1 norm 1.0 (1 system), d2 0.5+1.0 ×2 → MNZ 3.0, d3 0, d4 0
    val want = Set(
      (0L, 2L, 1.5, 2L, 3.0, 1),
      (0L, 1L, 1.0, 1L, 1.0, 2),
      (0L, 3L, 0.0, 1L, 0.0, 3),
      (0L, 4L, 0.0, 1L, 0.0, 4),
      (1L, 7L, 0.0, 1L, 0.0, 1),
      (1L, 8L, 0.0, 1L, 0.0, 2))
    assert(got == want, s"$got")
  }

  test("queryDifficulty equals the hand-computed index statistics") {
    val df = docs.toDF("doc_id", "text")
    val post = Retrieval.postings(df)
    val queries = Seq((300L, "quick dog")).toDF("query_id", "text")
    val got = Retrieval.queryDifficulty(post, queries, nDocs = 9L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    // idf(quick) = 9000 div 4 = 2250, idf(dog) = 9000 div 3 = 3000;
    // mean = 5250 div 2; scope = docs {0,1,2,3,8} → 5000 div 9 = 555
    assert(got == Seq((300L, 2L, 2625L, 2250L, 3000L, 7L, 5L, 555L)),
      got.toString)
  }

  test("RRF fusion equals the hand-computed witness, absences score 0") {
    // system A ranks docs 10,11,12; system B ranks 11,10,13 for query 0
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 11L, 1), (0L, 10L, 2), (0L, 13L, 3))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), kTop = 10)
      .collect().sortBy(_.getInt(5))
      .map(r => (r.getLong(1), r.getDouble(4))).toSeq
    def f(r: Int) = 1.0 / (60 + r).toDouble
    // fixed order: A's addend then B's; a doc missing from a system
    // contributes exactly 0.0 for it
    val want = Seq(
      10L -> (f(1) + f(2)), 11L -> (f(2) + f(1)),
      12L -> (f(3) + 0.0), 13L -> (0.0 + f(3)))
      .sortBy { case (d, s) => (-s, d) }
    assert(got == want, s"$got vs $want")
    // 10 and 11 tie exactly (symmetric ranks) -> doc_id breaks the tie
    assert(got.take(2).map(_._1) == Seq(10L, 11L))
  }

  // --- boolean retrieval (the Lucene clause model) ---

  private def boolPost = Retrieval.postings(docs.toDF("doc_id", "text"))

  private def bq(id: Long, must: Seq[String], should: Seq[String],
      not: Seq[String]) = (id, must, should, not)

  private def runBool(queries: Seq[(Long, Seq[String], Seq[String], Seq[String])],
      minShould: Int = 1): Map[Long, Seq[(Long, Long, Long)]] =
    Retrieval.booleanRetrieve(boolPost,
      queries.toDF("query_id", "must", "should", "must_not"), minShould)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  test("booleanRetrieve: every MUST term required") {
    // quick AND fox: docs 0 and 1 only (3 has quick+bear, 5 fox only,
    // 8 quick only)
    val got = runBool(Seq(bq(100L, Seq("quick", "fox"), Nil, Nil)))
    assert(got(100L).map(_._1) == Seq(0L, 1L))
    assert(got(100L).forall { case (_, mm, sm) => mm == 2L && sm == 0L })
  }

  test("booleanRetrieve: SHOULD gates at minShouldMatch, counts matched") {
    // must: the; should: quick, dog, fox — doc0 matches all three
    val q = Seq(bq(100L, Seq("the"), Seq("quick", "dog", "fox"), Nil))
    val at1 = runBool(q, minShould = 1)
    // "the" docs: 0,1,2,3,7; of those, should-matchers: 0(3), 1(2), 2(1), 3(1)
    assert(at1(100L) == Seq((0L, 1L, 3L), (1L, 1L, 2L), (2L, 1L, 1L),
      (3L, 1L, 1L)))
    val at3 = runBool(q, minShould = 3)
    assert(at3(100L).map(_._1) == Seq(0L))
  }

  test("booleanRetrieve: MUST_NOT excludes; purely-negative docs invisible") {
    // fox docs: 0,1,3(no),5; NOT lazy drops 0; doc 2 (lazy only) was
    // never a candidate — no positive match
    val got = runBool(Seq(bq(100L, Seq("fox"), Nil, Seq("lazy"))))
    assert(got(100L).map(_._1) == Seq(1L, 5L))
  }

  test("booleanRetrieve: role arrays deduplicate; should-only queries work") {
    // duplicated must term counts once; empty must -> should drives
    val got = runBool(Seq(
      bq(100L, Seq("quick", "quick"), Nil, Nil),
      bq(101L, Nil, Seq("snores", "den"), Nil)))
    assert(got(100L).forall(_._2 == 1L))
    assert(got(100L).map(_._1) == Seq(0L, 1L, 3L, 8L))
    assert(got(101L) == Seq((2L, 0L, 1L), (5L, 0L, 1L)))
  }

  test("bm25f: title occurrences outrank body occurrences; one saturation") {
    // two docs, same length, same single query-term count — doc 10
    // has "apple" in the title slice (first 2 tokens), doc 11 in the
    // body; the title weight must break the tie
    val corpus = Seq(
      (10L, "apple pad x y z w"),
      (11L, "pad pad x y apple w"),
      (12L, "other filler text here now ok"))
      .toDF("doc_id", "text")
    val fpost = Retrieval.bm25fPostings(corpus, titleLen = 2)
    // field split: doc 10 title {apple, pad}; doc 11 title {pad}x2
    val p10 = fpost.filter(col("doc_id") === 10L && col("term") === "apple")
      .head()
    assert(p10.getLong(2) == 1L && p10.getLong(3) == 0L) // tf_t, tf_b
    assert(p10.getLong(4) == 2L && p10.getLong(5) == 4L) // fl_t, fl_b
    val (nd, avgT, avgB) = Retrieval.bm25fStats(corpus, fpost)
    assert(nd == 3L)
    val got = Retrieval.bm25fTopK(fpost,
      Seq((100L, "apple")).toDF("query_id", "text"), nd, avgT, avgB,
      kTop = 5)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == Seq((10L, 1), (11L, 2)))
  }

  test("snippets: window slice, end-truncation, query-term highlighting") {
    val pass = Seq((100L, 0L, 3L, 1), (100L, 5L, 3L, 2))
      .toDF("query_id", "doc_id", "window_start", "rank")
    val queries = Seq((100L, "fox dog")).toDF("query_id", "text")
    val out = Retrieval.snippets(pass, docs.toDF("doc_id", "text"),
      queries, winW = 4)
      .collect().map(r => (r.getLong(1), r.getString(4), r.getString(5)))
      .sortBy(_._1)
    // doc 0 window at 3: tokens 3..6; doc 5 ("fox fox fox den") at 3:
    // only 2 tokens remain — the slice truncates, it never pads
    assert(out(0) == (0L, "brown fox jumps over", "brown [fox] jumps over"))
    assert(out(1) == (5L, "fox den", "[fox] den"))
  }

  test("facetCounts: per-query counts off one melted metadata join") {
    val meta = Seq((0L, "en", "web"), (1L, "en", "book"), (2L, "de", "web"),
      (3L, "en", "web"), (5L, "de", "book"), (8L, "en", "web"))
      .toDF("doc_id", "lang", "source")
    val cand = Seq((100L, 0L), (100L, 1L), (100L, 2L), (101L, 5L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.facetCounts(cand, meta, Seq("lang", "source"))
      .collect().map(r => ((r.getLong(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap
    assert(got == Map(
      (100L, "lang", "en") -> 2L, (100L, "lang", "de") -> 1L,
      (100L, "source", "web") -> 2L, (100L, "source", "book") -> 1L,
      (101L, "lang", "de") -> 1L, (101L, "source", "book") -> 1L))
  }
}
