package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical (sparse) retrieval over the document corpus: an inverted
  * index of whitespace-token postings and BM25 ranked top-k — the
  * text-side complement of the dense ANN family ([[IvfAnn]]/[[Pq]]),
  * and the candidate generator a training-data pipeline uses for
  * query-based decontamination and retrieval-augmented filtering.
  *
  * Scale shape (the part that must survive 100 TB):
  *
  *   - The corpus is touched by exactly TWO wide operations: the
  *     (doc_id, term) tf aggregation that builds the postings, and the
  *     final (query_id, doc_id) score aggregation. Everything
  *     query-sided — the query term set, its df/idf weights — is tiny
  *     and BROADCAST, so the postings are never shuffled by term for
  *     the probe: candidates fall out of a broadcast hash join
  *     (inverted-index lookup), never a corpus × queries cross join.
  *   - df/idf is attached to the QUERY TERMS, not to the postings:
  *     the df join runs on the vocabulary-sized side first and the
  *     (term, idf) result — bounded by the number of distinct query
  *     terms — rides the same broadcast.
  *   - [[bm25TopKPruned]] is the pruned two-phase path: per term a
  *     "champion list" keeps only the top `c` postings by impact
  *     (the doc-length-normalized tf part of the weight), the UNION of
  *     the query terms' lists is the candidate set — bounded by
  *     |query terms| × c regardless of corpus size — and candidates
  *     are then re-scored EXACTLY against the full postings, so every
  *     emitted score is bit-identical to the unpruned run's. This is
  *     the classic inexact-retrieval architecture (bounded candidate
  *     generation, exact second-phase scoring).
  *
  * Determinism contract (oracle-able in DuckDB, q67 conventions):
  * idf is the INTEGER milli proxy `(nDocs * 1000) div df` (exact in
  * both engines, same total order as ln(N/df)); the per-term BM25
  * contribution is a fixed-shape double expression (every operand an
  * exact integer→double conversion, one division — IEEE-identical
  * across engines); per-(query, doc) scores sum contributions in
  * TERM-ASCENDING order (sort_array fold here, `list_sum(list(...
  * ORDER BY term))` in the oracle — the q151 association); ranks
  * break ties (score desc, doc_id asc).
  */
object Retrieval {

  /** Okapi defaults — pinned as SOURCE-TEXT literals on both sides
    * (`2.2` parsed here and `CAST(2.2 AS DOUBLE)` parsed by DuckDB are
    * the same nearest double; `1.2 + 1` computed in doubles is NOT). */
  val K1 = 1.2
  val K1Plus1 = 2.2
  val B = 0.75
  val OneMinusB = 0.25

  /** Champion-list depth q154 pins. The synthetic corpus is the WORST
    * case for selective pruning — a 31-word vocabulary where every
    * term's df is ~80% of the corpus, so no query term discriminates.
    * Measured overlap@10 of the two-phase run vs the full run:
    * 500 docs — 0.95 at c=64 (0.75 at 32, 0.40 at 16); 5000 docs —
    * 0.26 at 64, 0.75 at 256, 0.94 at 512. I.e. with ZERO term
    * selectivity, holding recall needs c ∝ corpus size — the known
    * champion-list failure mode (tiered indexes are the published
    * remedy). On Zipfian text, content-term df/N is roughly constant
    * in N, so a FIXED c holds recall and the |q|×c candidate bound is
    * the scale contract; that contract (not this corpus's recall) is
    * what the operator carries to 100 TB. */
  val DefaultChampionC = 64

  /** Postings: one row per (doc_id, term) with the term frequency and
    * the document length (dl = total whitespace tokens, re-derived as
    * sum(tf) over the doc's terms so the index is self-contained). */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    tf.join(dl, Seq("doc_id"))
  }

  /** The doc-length-normalized tf part of the BM25 weight — the whole
    * per-posting contribution except the term-constant idf factor.
    * ONE pinned expression shape shared by the scorer and the champion
    * ordering (within a term, ranking by it IS ranking by true
    * contribution). */
  private def tfPart(tf: Column, dl: Column, avgdl: Double): Column =
    (tf.cast("double") * lit(K1Plus1)) /
      (tf.cast("double") +
        lit(K1) * (lit(OneMinusB) + lit(B) * (dl.cast("double") / lit(avgdl))))

  /** Champion list: per term only the top `c` postings by IMPACT —
    * the [[tfPart]] weight descending (idf is constant within a term,
    * so this is exactly the true within-term contribution order; raw
    * tf would tie everywhere on natural text and degrade to doc-id
    * picks), ties to the lower doc_id. The classic impact-ordered
    * prune, serving [[bm25TopKPruned]] as its candidate generator.
    * One term-keyed window over the postings. */
  def championPostings(post: DataFrame, c: Int, avgdl: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
      .orderBy(tfPart(col("tf"), col("dl"), avgdl).desc, col("doc_id").asc)
    post.withColumn("_crk", row_number().over(w))
      .filter(col("_crk") <= c).drop("_crk")
  }

  /** BM25 top-k against a postings frame. `queries` is (query_id,
    * text); its DISTINCT terms probe the index (query-side tf is 1 —
    * the standard short-query simplification). A query never
    * retrieves itself (`query_id === doc_id` excluded), so corpus
    * docs can serve as queries.
    *
    * `candidates`, when present, is a (query_id, doc_id) frame that
    * restricts scoring to those pairs (second phase of the pruned
    * path) — it is candidate-bounded-small and rides a broadcast
    * semi join, so the restriction never shuffles the postings.
    *
    * `nDocs` and `avgdl` parameterize the weighting and must describe
    * the FULL corpus; [[corpusStats]] derives them. */
  def bm25TopK(post: DataFrame, queries: DataFrame, nDocs: Long,
      avgdl: Double, kTop: Int, idCol: String = "query_id",
      textCol: String = "text",
      candidates: Option[DataFrame] = None): DataFrame = {
    val weighted = queryTermWeights(post, queryTerms(queries, idCol, textCol),
      nDocs)
    // contribution shape pinned against the oracle SQL literal for
    // literal: idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl/avgdl)))
    val contrib = col("idf_milli").cast("double") *
      tfPart(col("tf"), col("dl"), avgdl)
    foldRankSelect(post, weighted, contrib, kTop, candidates)
  }

  /** The scorer's shared back half: probe the postings with the
    * broadcast weighted query terms, optionally restrict to candidate
    * pairs, fold `contrib` per (query, doc) TERM-ASCENDING (the q151
    * ordered-association contract), rank (score desc, doc_id asc),
    * keep the top `kTop`. */
  private def foldRankSelect(post: DataFrame, weighted: DataFrame,
      contrib: Column, kTop: Int,
      candidates: Option[DataFrame]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val matched = post.join(broadcast(weighted), Seq("term"))
      .filter(col("query_id") =!= col("doc_id"))
    val restricted = candidates.fold(matched)(cand =>
      matched.join(broadcast(cand), Seq("query_id", "doc_id"), "left_semi"))
    restricted
      .withColumn("contrib", contrib)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("contrib")))),
        lit(0.0),
        (acc, x) => acc + x.getField("contrib")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** A query frame's DISTINCT (query_id, term) pairs. */
  private def queryTerms(queries: DataFrame, idCol: String,
      textCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .distinct()

  /** (query_id, term, df, idf_milli) for a query-term frame. df only
    * for the query's term set: broadcast-semi-join the postings FIRST
    * (narrow filter), then a tiny per-term count — the full dictionary
    * is never shuffled for a probe. */
  private def queryTermWeights(post: DataFrame, qterms: DataFrame,
      nDocs: Long): DataFrame = {
    val dfreq = post
      .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    qterms.join(dfreq, Seq("term"))
      .withColumn("idf_milli", expr(s"${nDocs * 1000L}L div df"))
  }

  /** The pruned two-phase retrieval: candidate generation through the
    * champion lists (union over the query's terms — at most
    * |query terms| × c docs per query, INDEPENDENT of corpus size),
    * then exact BM25 over the full postings restricted to those
    * candidates. Every emitted (query, doc, score) is bit-identical to
    * the unpruned [[bm25TopK]]'s row for the same pair; only docs
    * outside every query term's champion list can be missed. */
  def bm25TopKPruned(post: DataFrame, queries: DataFrame, nDocs: Long,
      avgdl: Double, kTop: Int, c: Int = DefaultChampionC,
      idCol: String = "query_id", textCol: String = "text"): DataFrame = {
    val qterms = queries.select(col(idCol).as("query_id"),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
      .distinct()
    val cand = championPostings(post, c, avgdl)
      .select(col("term"), col("doc_id"))
      .join(broadcast(qterms), Seq("term"))
      .select(col("query_id"), col("doc_id"))
      .distinct()
    bm25TopK(post, queries, nDocs, avgdl, kTop, idCol, textCol,
      candidates = Some(cand))
  }

  /** RM3-style pseudo-relevance feedback, phase 1: expansion-term
    * selection. Run the base BM25 (top `kFb` feedback docs per query),
    * pool the feedback docs' postings, and weight each candidate term
    * by Σ tf over the query's feedback set — an INTEGER weight, so
    * selection is exact in any engine. Original query terms are
    * excluded (they re-enter phase 2 at full weight); the top `mExp`
    * terms per query are kept by (weight desc, term asc).
    *
    * Scale shape: the feedback set is |queries| × kFb (query_id,
    * doc_id) pairs — broadcast against the postings, so pooling is one
    * narrow probe of the index, never a corpus pass. */
  def rm3ExpansionTerms(post: DataFrame, queries: DataFrame, nDocs: Long,
      avgdl: Double, kFb: Int, mExp: Int, idCol: String = "query_id",
      textCol: String = "text"): DataFrame = {
    val fb = bm25TopK(post, queries, nDocs, avgdl, kFb, idCol, textCol)
      .select(col("query_id"), col("doc_id"))
    val qterms = queryTerms(queries, idCol, textCol)
    val pooled = post.join(broadcast(fb), Seq("doc_id"))
      .groupBy(col("query_id"), col("term"))
      .agg(sum(col("tf")).as("wt"))
      .join(qterms, Seq("query_id", "term"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("wt").desc, col("term").asc)
    pooled.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= mExp)
      .select(col("query_id"), col("term"), col("wt"), col("rank"))
  }

  /** RM3 phase 2: re-score under the expanded query — original terms
    * at weight 1000 milli, expansion terms at `lambdaMilli` (default
    * 500 = λ 0.5). Per-term contribution is
    * `qw · (idf · tfPart)` with the inner product the base scorer's
    * own shape and the outer factor one more exact int→double
    * multiply, folded term-ascending as always. The expanded term set
    * stays |queries| × (|q| + mExp) — still broadcast. */
  def rm3Rescored(post: DataFrame, queries: DataFrame, nDocs: Long,
      avgdl: Double, kTop: Int, kFb: Int, mExp: Int,
      lambdaMilli: Long = 500L, idCol: String = "query_id",
      textCol: String = "text"): DataFrame = {
    val exp = rm3ExpansionTerms(post, queries, nDocs, avgdl, kFb, mExp,
      idCol, textCol)
    val eq = queryTerms(queries, idCol, textCol)
      .withColumn("qw_milli", lit(1000L))
      .unionByName(exp.select(col("query_id"), col("term"),
        lit(lambdaMilli).as("qw_milli")))
    val weighted = queryTermWeights(post, eq, nDocs)
    val contrib = col("qw_milli").cast("double") *
      (col("idf_milli").cast("double") *
        tfPart(col("tf"), col("dl"), avgdl))
    foldRankSelect(post, weighted, contrib, kTop, candidates = None)
  }

  /** Exactness certificate for the two-phase pruned retrieval — the
    * WAND/MaxScore upper-bound argument in batch form. Per term, the
    * best impact any NON-champion posting can contribute is the
    * (c+1)-th impact in that term's ordering (`ub_t`; 0 when df ≤ c,
    * i.e. the champion list holds every posting). A doc outside the
    * candidate set scores at most
    * `UB_q = Σ_t idf_t · ub_t` over the query's terms (term-ascending
    * fold, the scorer's own association) — so whenever the k-th
    * candidate's EXACT score strictly beats UB_q, no missed doc can
    * enter the top-k and the pruned result is PROVABLY equal to the
    * full run's (RetrievalSpec pins the theorem). Emits per query:
    * candidate count, the k-th score, UB_q, and the certificate
    * `ub_remaining = 0 OR (n_cand ≥ k AND kth_score > ub_remaining)`.
    *
    * Scale shape: one postings window (champions AND the (c+1)-th
    * impact fall out of the same rank pass), one candidate-restricted
    * scoring aggregation, then query-sized joins — the certificate
    * itself costs |query terms| arithmetic. */
  def certifiedPrunedReport(post: DataFrame, queries: DataFrame,
      nDocs: Long, avgdl: Double, kTop: Int, c: Int = DefaultChampionC,
      idCol: String = "query_id", textCol: String = "text"): DataFrame = {
    val qterms = queryTerms(queries, idCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
      .orderBy(tfPart(col("tf"), col("dl"), avgdl).desc, col("doc_id").asc)
    val ranked = post
      .withColumn("_imp", tfPart(col("tf"), col("dl"), avgdl))
      .withColumn("_crk", row_number().over(w))
      .filter(col("_crk") <= c + 1)
    val cand = ranked.filter(col("_crk") <= c)
      .select(col("term"), col("doc_id"))
      .join(broadcast(qterms), Seq("term"))
      .select(col("query_id"), col("doc_id"))
      .distinct()
    val ubt = ranked.filter(col("_crk") === c + 1)
      .select(col("term"), col("_imp").as("ub"))
    // exact second-phase scores for EVERY candidate (kTop unbounded so
    // the per-query candidate count is the max rank)
    val scored = bm25TopK(post, queries, nDocs, avgdl, kTop = Int.MaxValue,
      idCol, textCol, candidates = Some(cand))
    val counts = scored.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_cand"))
    val kth = scored.join(counts, Seq("query_id"))
      .filter(col("rank") === least(lit(kTop).cast("long"), col("n_cand")))
      .select(col("query_id"), col("n_cand"), col("score").as("kth_score"))
    val weighted = queryTermWeights(post, qterms, nDocs)
    // UB_q: the scorer's contribution shape with ub_t in tf-part
    // position, folded term-ascending; terms fully inside their
    // champion list (df ≤ c → no (c+1)-th row) contribute exactly 0.0
    val ubq = weighted.join(ubt, Seq("term"), "left_outer")
      .withColumn("contrib",
        col("idf_milli").cast("double") * coalesce(col("ub"), lit(0.0)))
      .groupBy(col("query_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("contrib")))),
        lit(0.0),
        (acc, x) => acc + x.getField("contrib")).as("ub_remaining"))
    queries.select(col(idCol).as("query_id")).distinct()
      .join(kth, Seq("query_id"), "left_outer")
      .join(ubq, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("kth_score"),
        coalesce(col("ub_remaining"), lit(0.0)).as("ub_remaining"))
      .withColumn("certified",
        col("ub_remaining") === 0.0 ||
          (col("n_cand") >= kTop && col("kth_score") > col("ub_remaining")))
  }

  /** Reciprocal-rank fusion (Cormack 2009) of named per-query rankings
    * — the standard hybrid-retrieval combiner (e.g. BM25 + dense ANN).
    * Each input frame is (query_id, doc_id, rank); the fused score is
    * Σ 1/(rrfK + rank) over the systems that retrieved the pair, in
    * the GIVEN system order (a fixed-order double sum, each addend one
    * exact int→double conversion and one division — IEEE-identical in
    * any engine), absent systems contributing exactly 0.0. Emits each
    * system's rank as `rank_<name>` (null when absent) plus the fused
    * `rrf_score` and the re-ranked `rank` (score desc, doc_id asc).
    *
    * Scale shape: every ranking is |queries| × k rows — candidate-
    * bounded, corpus-independent — so the fusion is a chain of small
    * joins that never touches the corpus. */
  def rrfFuse(systems: Seq[(String, DataFrame)], kTop: Int,
      rrfK: Int = 60): DataFrame = {
    require(systems.nonEmpty, "rrfFuse needs at least one ranking")
    val renamed = systems.map { case (n, df) =>
      df.select(col("query_id"), col("doc_id"), col("rank").as(s"rank_$n"))
    }
    val joined = renamed.reduce(
      (a, b) => a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    val score = systems.map { case (n, _) =>
      coalesce(lit(1.0) / (lit(rrfK) + col(s"rank_$n")).cast("double"),
        lit(0.0))
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    joined.withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("query_id") +: col("doc_id") +:
        systems.map { case (n, _) => col(s"rank_$n") } :+
        col("rrf_score") :+ col("rank"): _*)
  }

  /** Positional postings: one row per token OCCURRENCE — (doc_id, term,
    * pos) with pos the 1-based whitespace-token position. The positional
    * inverted index that phrase and proximity retrieval probe. The space
    * price vs [[postings]] is the textbook one (~dl rows per doc instead
    * of ≤ distinct terms); the build is one narrow corpus pass with no
    * shuffle at all — partition-local explode, written as produced. */
  def posPostings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("p0", "term")))
      .select(col("doc_id"), col("term"),
        (col("p0") + 1).cast("long").as("pos"))

  /** Exact phrase retrieval over the positional index. `phrases` is
    * (query_id, text); a phrase with ordered tokens t_1..t_n occurs in a
    * doc anchored at position a iff t_i sits at a+i-1 for every i. Each
    * matched occurrence is anchored at `pos - ord + 1` and an anchor
    * counts when it covers ALL n ordinals — so overlapping occurrences
    * and repeated-token phrases ("a a") count correctly (each ordinal
    * matches independently). Self-retrieval is allowed: the phrase's
    * source doc is a legitimate (and guaranteed) hit. Emits (query_id,
    * doc_id, phrase_tf, first_pos, rank) — rank by (phrase_tf desc,
    * doc_id asc), top `kTop`.
    *
    * Scale shape: the phrase-term table is |phrases| × n and BROADCAST;
    * the index is probed by one broadcast hash join (only occurrences of
    * phrase terms survive the probe — the inverted-index lookup), then
    * two candidate-sized aggregations. The corpus is never shuffled. */
  def phraseMatches(posPost: DataFrame, phrases: DataFrame, kTop: Int,
      idCol: String = "query_id", textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("phrase_tf").desc, col("doc_id").asc)
    phraseOccurrences(posPost, phrases, idCol, textCol)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("phrase_tf"), min(col("anchor")).as("first_pos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("doc_id"), col("phrase_tf"),
        col("first_pos"), col("rank"))
  }

  /** Every full phrase occurrence — (query_id, doc_id, anchor,
    * n_terms), one row per anchored match (see [[phraseMatches]] for
    * the anchored-ordinal argument). The shared front half of phrase
    * ranking and span redaction ([[redactPhrases]]). */
  def phraseOccurrences(posPost: DataFrame, phrases: DataFrame,
      idCol: String = "query_id", textCol: String = "text"): DataFrame = {
    val pt = phrases.select(col(idCol).as("query_id"),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as(Seq("o0", "term")))
      .select(col("query_id"), (col("o0") + 1).cast("long").as("ord"),
        col("term"))
    val plen = pt.groupBy(col("query_id"))
      .agg(countDistinct(col("ord")).as("n_terms"))
    posPost.join(broadcast(pt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"),
        (col("pos") - col("ord") + 1).as("anchor"))
      .agg(countDistinct(col("ord")).as("n_ord"))
      .join(broadcast(plen), Seq("query_id"))
      .filter(col("n_ord") === col("n_terms"))
      .select(col("query_id"), col("doc_id"), col("anchor"), col("n_terms"))
  }

  /** Blocklist span redaction: every occurrence of any blocklist
    * phrase is masked token-for-token (`maskTok`) and the document
    * re-rendered — the contamination-rewrite pattern (q126) driven by
    * the positional index instead of rolling hashes. Overlapping and
    * repeated spans union cleanly (positions are a set). Emits one row
    * per AFFECTED doc: (doc_id, n_redacted_tokens, redacted_text).
    *
    * Scale shape: occurrence detection is the broadcast phrase probe;
    * the rewrite touches only affected docs (an inner join against the
    * per-doc masked-position sets), each rebuilt in one row-local
    * array transform — no shuffle beyond the position aggregation. */
  def redactPhrases(docs: DataFrame, posPost: DataFrame,
      blocklist: DataFrame, maskTok: String = "___",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spans = phraseOccurrences(posPost, blocklist)
      .select(col("doc_id"),
        explode(sequence(col("anchor"),
          col("anchor") + col("n_terms") - 1)).as("pos"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("pos"))).as("mask"))
    val ts = graft.functions.TextFunctions.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), ts.as("_ts"))
      .join(spans, Seq("doc_id"))
      .select(col("doc_id"),
        size(col("mask")).cast("long").as("n_redacted_tokens"),
        array_join(transform(sequence(lit(1), size(col("_ts"))), i =>
          when(array_contains(col("mask"), i.cast("long")), lit(maskTok))
            .otherwise(element_at(col("_ts"), i))), " ")
          .as("redacted_text"))
  }

  /** Conjunctive proximity ranking: over docs containing EVERY query
    * term (AND semantics — the mode where position, not coverage, must
    * decide), per (query, doc):
    *
    *   - `min_pair_dist` — the minimum position distance between
    *     occurrences of two DIFFERENT query terms. The minimum over all
    *     cross-term pairs is always attained at ADJACENT entries of the
    *     doc's merged query-term occurrence list (any occurrence strictly
    *     between a closer pair would itself form a closer pair), so one
    *     position-ordered lag window computes it in O(occ log occ) —
    *     never the occ² pairwise join.
    *   - `n_cowindows` — how many width-`bucketW` position buckets
    *     contain ALL the query's terms (jumping-window co-occurrence).
    *
    * Rank: (min_pair_dist asc, n_cowindows desc, doc_id asc), top
    * `kTop`; a query never retrieves itself (the [[bm25TopK]] contract).
    * Single-term queries emit nothing (no cross-term pair exists).
    *
    * Scale shape: the query-term probe is the same broadcast
    * inverted-index lookup as BM25's; the lag window and the bucket
    * aggregation both run on probe output (occurrences of query terms
    * only), partitioned by (query, doc) — per-partition state is one
    * doc's occurrence list. */
  def proximityRank(posPost: DataFrame, queries: DataFrame, kTop: Int,
      bucketW: Int = 16, idCol: String = "query_id",
      textCol: String = "text"): DataFrame = {
    val qt = queries.select(col(idCol).as("query_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("term"))
      .distinct()
    val nq = qt.groupBy(col("query_id")).agg(count(lit(1)).as("n_q"))
    val m = posPost.join(broadcast(qt), Seq("term"))
      .filter(col("query_id") =!= col("doc_id"))
    // conjunctive restriction: docs matching every query term
    val full = m.groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("n_m"))
      .join(broadcast(nq), Seq("query_id"))
      .filter(col("n_m") === col("n_q"))
      .select(col("query_id"), col("doc_id"))
    val mm = m.join(full, Seq("query_id", "doc_id"), "left_semi")
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"), col("doc_id"))
      .orderBy(col("pos").asc)
    val dist = mm
      .withColumn("ptrm", lag(col("term"), 1).over(wl))
      .withColumn("ppos", lag(col("pos"), 1).over(wl))
      .withColumn("gap", when(col("ptrm").isNotNull &&
        col("ptrm") =!= col("term"), col("pos") - col("ppos")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(min(col("gap")).as("min_pair_dist"))
      .filter(col("min_pair_dist").isNotNull)
    val cow = mm
      .groupBy(col("query_id"), col("doc_id"),
        expr(s"(pos - 1) div $bucketW").as("bkt"))
      .agg(countDistinct(col("term")).as("n_t"))
      .join(broadcast(nq), Seq("query_id"))
      .filter(col("n_t") === col("n_q"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_cowindows"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("min_pair_dist").asc, col("n_cowindows").desc,
        col("doc_id").asc)
    dist.join(cow, Seq("query_id", "doc_id"), "left_outer")
      .withColumn("n_cowindows", coalesce(col("n_cowindows"), lit(0L)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("doc_id"), col("min_pair_dist"),
        col("n_cowindows"), col("rank"))
  }

  /** Best-passage (snippet) extraction: for each (query, doc) pair the
    * width-`winW` token window with the highest idf mass — score =
    * Σ idf_milli over the DISTINCT query terms present in the window,
    * an ALL-INTEGER sum (no fold-order contract needed). Windows are
    * anchored at query-term occurrences (the optimal window can always
    * start at one: sliding a window right up to its first matched
    * occurrence never drops a term). Ties: higher score, then the
    * EARLIEST window; docs rank by (best score desc, doc_id asc),
    * top `kTop`. The passage-retrieval primitive behind snippet
    * generation and long-doc chunk selection.
    *
    * Scale shape: occurrences pair with candidate anchors through a
    * BANDED join — both sides keyed by the width-`winW` position
    * bucket, each occurrence emitted into its own and the NEXT bucket
    * (an anchor in bucket b only covers positions in b and b+1), exact
    * range predicate applied after. Pre-filter blowup is exactly 2×
    * probe output — bounded by the window width, NEVER the occ² of a
    * naive per-doc cross join. */
  def bestPassages(post: DataFrame, posPost: DataFrame, queries: DataFrame,
      nDocs: Long, winW: Int, kTop: Int, idCol: String = "query_id",
      textCol: String = "text"): DataFrame = {
    require(winW >= 1, s"winW must be positive, got $winW")
    val weighted = queryTermWeights(post, queryTerms(queries, idCol, textCol),
      nDocs).select(col("query_id"), col("term"), col("idf_milli"))
    val m = posPost.join(broadcast(weighted), Seq("term"))
      .filter(col("query_id") =!= col("doc_id"))
    // ONE aggregation gathers each (query, doc)'s matched occurrences
    // into a pos-sorted array; the best window is then found ROW-LOCALLY
    // — every occurrence tried as an anchor, its window scored over the
    // same array — so the per-pair work that the banded form spread
    // across an anchor×occurrence join + two more aggregations runs
    // inside one task with no shuffle of pre-verify pairs at all. The
    // occurrence list is exactly the banded join's per-pair probe mass
    // (matched query-term occurrences, not the document), so the row
    // stays small; [[bestPassagesBanded]] is the parity witness
    // (spec-pinned equal on real corpora).
    //
    // Tie discipline preserved: anchors are tried in ascending position
    // (the array is pos-sorted, positions unique within a doc) and only
    // a STRICTLY better score replaces the incumbent, so equal-score
    // ties keep the EARLIEST window — the banded form's
    // max(struct(score, -anchor)) order. Scores are the same integer
    // Σ idf_milli over array_distinct'd (term, idf) structs.
    val best = m
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(
        struct(col("pos"), col("term"), col("idf_milli")))).as("_os"))
      .select(col("query_id"), col("doc_id"),
        expr(
          s"""aggregate(
             |  transform(_os, o -> named_struct(
             |    'score',
             |    aggregate(
             |      array_distinct(transform(
             |        filter(_os, x -> x.pos >= o.pos
             |                     AND x.pos <= o.pos + ${winW - 1}),
             |        x -> named_struct('term', x.term,
             |                          'idf', x.idf_milli))),
             |      CAST(0 AS BIGINT), (a, y) -> a + y.idf),
             |    'anchor', o.pos,
             |    'nt', CAST(size(array_distinct(transform(
             |      filter(_os, x -> x.pos >= o.pos
             |                   AND x.pos <= o.pos + ${winW - 1}),
             |      x -> x.term))) AS BIGINT))),
             |  named_struct('score', CAST(-1 AS BIGINT),
             |               'anchor', CAST(0 AS BIGINT),
             |               'nt', CAST(0 AS BIGINT)),
             |  (best, c) -> CASE WHEN c.score > best.score
             |               THEN c ELSE best END)""".stripMargin).as("_b"))
      .select(col("query_id"), col("doc_id"),
        col("_b.anchor").as("window_start"),
        col("_b.score").as("passage_score"),
        col("_b.nt").as("n_window_terms"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("passage_score").desc, col("doc_id").asc)
    best.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("doc_id"), col("window_start"),
        col("passage_score"), col("n_window_terms"), col("rank"))
  }

  /** The banded-join formulation of [[bestPassages]] — the parity
    * witness for the row-local scorer (spec-pinned equal): occurrences
    * pair with candidate anchors through a width-`winW` position-bucket
    * band join (each occurrence emitted into its own and the previous
    * bucket), exact range predicate after, then per-anchor distinct-sum
    * and a per-pair argmax. Kept because its 2×-bounded pre-filter
    * blowup is the documented scale argument the row-local form
    * inherits. */
  private[graft] def bestPassagesBanded(post: DataFrame, posPost: DataFrame,
      queries: DataFrame, nDocs: Long, winW: Int, kTop: Int,
      idCol: String = "query_id", textCol: String = "text"): DataFrame = {
    require(winW >= 1, s"winW must be positive, got $winW")
    val weighted = queryTermWeights(post, queryTerms(queries, idCol, textCol),
      nDocs).select(col("query_id"), col("term"), col("idf_milli"))
    val m = posPost.join(broadcast(weighted), Seq("term"))
      .filter(col("query_id") =!= col("doc_id"))
    val anchors = m.select(col("query_id"), col("doc_id"),
        col("pos").as("anchor"))
      .withColumn("bkt", expr(s"(anchor - 1) div $winW"))
    // each occurrence lands in its bucket and the next: anchors in
    // bucket b cover positions in buckets b and b+1 only
    val occ = m.select(col("query_id"), col("doc_id"), col("term"),
        col("idf_milli"), col("pos"))
      .withColumn("bkt", explode(array(
        expr(s"(pos - 1) div $winW"), expr(s"(pos - 1) div $winW - 1"))))
    // one aggregation scores every window: the per-anchor term set is
    // ≤ winW entries, so distinct-and-sum runs INSIDE the group (an
    // array op on a tiny list) instead of as its own corpus-wide
    // distinct shuffle
    val scored = anchors.join(occ, Seq("query_id", "doc_id", "bkt"))
      .filter(col("pos") >= col("anchor") &&
        col("pos") <= col("anchor") + (winW - 1))
      .groupBy(col("query_id"), col("doc_id"), col("anchor"))
      .agg(array_distinct(
        collect_list(struct(col("term"), col("idf_milli")))).as("_ts"))
      .select(col("query_id"), col("doc_id"), col("anchor"),
        expr("aggregate(_ts, 0L, (a, x) -> a + x.idf_milli)")
          .as("passage_score"),
        size(col("_ts")).cast("long").as("n_window_terms"))
    // best window per (query, doc) as a map-side-combinable max over
    // struct(score, -anchor, ...) — (score desc, anchor asc) without a
    // row_number window over one group PER ANCHOR (measured 6× on the
    // 500k-doc corpus: the anchor-keyed window sort was the bottleneck)
    val best = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(max(struct(col("passage_score"), (-col("anchor")).as("_na"),
        col("n_window_terms"))).as("_b"))
      .select(col("query_id"), col("doc_id"),
        (-col("_b._na")).as("window_start"),
        col("_b.passage_score").as("passage_score"),
        col("_b.n_window_terms").as("n_window_terms"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("passage_score").desc, col("doc_id").asc)
    best.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("doc_id"), col("window_start"),
        col("passage_score"), col("n_window_terms"), col("rank"))
  }

  /** SERP near-duplicate collapse: given a ranking and a per-doc
    * content fingerprint, keep only the BEST-ranked result per
    * (query, fingerprint) cluster and close the rank gaps — the
    * result-page dedup every search stack runs so three mirrors of one
    * page don't fill the top-3. Emits (query_id, doc_id, orig_rank,
    * rank) with `rank` contiguous after the collapse. Both inputs are
    * toplist-sized; the fingerprint join is the only corpus-derived
    * side and arrives pre-aggregated (one row per doc). */
  def collapseNearDups(ranking: DataFrame, fingerprints: DataFrame)
      : DataFrame = {
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"), col("fp"))
      .orderBy(col("rank").asc)
    val wOut = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rank").asc)
    ranking.join(fingerprints, Seq("doc_id"))
      .withColumn("_krk", row_number().over(wIn))
      .filter(col("_krk") === 1).drop("_krk")
      .withColumn("orig_rank", col("rank"))
      .withColumn("rank", row_number().over(wOut))
      .select(col("query_id"), col("doc_id"), col("orig_rank"), col("rank"))
  }

  /** SymSpell-style spelling correction (Garbe's deletion-variant
    * join): candidate (query token, vocabulary term) pairs fall out of
    * matching single-character-DELETION variants — a term matches a
    * query token at edit distance ≤ 1 only if they share a variant
    * (either string itself, or one with one char deleted) — then exact
    * `levenshtein ≤ 1` verifies and collection frequency ranks the
    * suggestions (cf desc, term asc, top `kTop`; the identity
    * suggestion dist = 0 ranks by the same rule).
    *
    * Scale shape: the vocabulary expands to ≤ (len+1) variant rows per
    * term — vocabulary-sized, NOT corpus-sized — and the query side is
    * broadcast; the quadratic all-pairs distance matrix is never
    * materialized (the published SymSpell argument). */
  def spellSuggest(post: DataFrame, queryTokens: DataFrame,
      kTop: Int): DataFrame = {
    def variants(t: Column): Column = array_union(
      array(t),
      filter(transform(sequence(lit(1), length(t)), i =>
        concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t)))),
        v => v =!= ""))
    val vocab = post.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val vv = vocab.select(col("term"), col("cf"),
      explode(variants(col("term"))).as("variant"))
    val qv = queryTokens.select(col("token"),
      explode(variants(col("token"))).as("variant"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token"))
      .orderBy(col("cf").desc, col("term").asc)
    vv.join(broadcast(qv), Seq("variant"))
      .select(col("token"), col("term"), col("cf")).distinct()
      .withColumn("dist", levenshtein(col("token"), col("term")))
      .filter(col("dist") <= 1)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("token"), col("term"), col("dist"), col("cf"), col("rank"))
  }

  /** Prefix completion (query autocomplete): for every distinct
    * `prefixLen`-character prefix in the index vocabulary, the top
    * `kTop` completions by collection frequency (Σ tf), ties to the
    * lexicographically lower term. Terms shorter than the prefix length
    * complete under their full text. One vocabulary-sized aggregation
    * off the postings plus one prefix-keyed window — the completion
    * table is vocabulary-bounded, orders of magnitude below the corpus,
    * and at serving time it's a broadcast dictionary. */
  def prefixCompletions(post: DataFrame, prefixLen: Int,
      kTop: Int): DataFrame = {
    require(prefixLen >= 1, s"prefixLen must be positive, got $prefixLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prefix"))
      .orderBy(col("cf").desc, col("term").asc)
    post.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
      .withColumn("prefix", substring(col("term"), 1, prefixLen))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("prefix"), col("term"), col("cf"), col("rank"))
  }

  /** Variable-byte index size estimate — the capacity-planning operator
    * run before materializing a 100 TB index: per term, the byte cost
    * of the doc-id postings list under delta-gap + VByte encoding
    * (gaps from the SORTED doc-id run; the first gap is doc_id + 1 so
    * every gap is ≥ 1) plus the VByte cost of the tf column, and the
    * resulting bytes-per-posting in permille. All integer: gap
    * arithmetic, CASE-threshold byte widths (7 payload bits per byte),
    * integer-div permille. One term-keyed window + one aggregation. */
  def indexSizeEstimate(post: DataFrame): DataFrame = {
    def vbyte(c: Column): Column =
      when(c < 128L, 1L).when(c < 16384L, 2L).when(c < 2097152L, 3L)
        .when(c < 268435456L, 4L).otherwise(5L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
      .orderBy(col("doc_id").asc)
    post
      .withColumn("_pdoc", lag(col("doc_id"), 1).over(w))
      .withColumn("gap", when(col("_pdoc").isNull, col("doc_id") + 1)
        .otherwise(col("doc_id") - col("_pdoc")))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(vbyte(col("gap"))).as("bytes_docgaps"),
        sum(vbyte(col("tf"))).as("bytes_tf"))
      .withColumn("bytes_per_posting_permille",
        expr("(bytes_docgaps + bytes_tf) * 1000 div df"))
      .select(col("term"), col("df"), col("bytes_docgaps"), col("bytes_tf"),
        col("bytes_per_posting_permille"))
  }

  /** Milli-quantized nDCG position discounts: round(1000 / log2(1+i))
    * for ranks i = 1..10, pinned as INTEGER literals so both engines
    * score without ever evaluating a logarithm (the q127 bitLen
    * discipline: quantize the transcendental ONCE, at authoring time). */
  val NdcgDiscountMilli: Seq[Long] =
    Seq(1000L, 631L, 500L, 431L, 387L, 356L, 333L, 315L, 301L, 289L)

  /** Ranking-agreement metrics — the offline evaluation harness run
    * after every retrieval change: score a system's top-`k` against a
    * per-query relevant set (binary qrels; here typically the exact
    * dense top-k as pseudo-qrels, measuring lexical↔dense agreement).
    * Per query, ALL-INTEGER metrics:
    *
    *   - `n_rel`, `hits` — qrel size and relevant docs retrieved in the
    *     top-k; `overlap_permille` = 1000·hits div k.
    *   - `mrr_milli` — 1000 div (first relevant rank), 0 when none: the
    *     exact-rational MRR in milli units.
    *   - `dcg_milli` — Σ [[NdcgDiscountMilli]](rank) over relevant
    *     retrieved ranks; `ndcg_permille` = 1000·DCG div IDCG with IDCG
    *     the discount prefix-sum at min(n_rel, k) — the ideal ranking's
    *     DCG under the same quantized discounts.
    *
    * Queries with an empty qrel row set simply don't appear (metrics
    * over an empty relevant set are undefined). Both inputs are
    * top-k/qrel sized — |queries| × k rows — so every join here is
    * broadcast-scale and corpus-independent. */
  def rankingAgreement(sys: DataFrame, rel: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= NdcgDiscountMilli.size,
      s"k must be in [1, ${NdcgDiscountMilli.size}] (pinned discount table)")
    val disc = NdcgDiscountMilli.take(k)
    val prefix = disc.scanLeft(0L)(_ + _).drop(1) // prefix(j) = Σ first j
    val relCount = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val hit = sys.filter(col("rank") <= k)
      .join(rel.select(col("query_id"), col("doc_id"),
        lit(1L).as("is_rel")), Seq("query_id", "doc_id"), "left_outer")
      .withColumn("is_rel", coalesce(col("is_rel"), lit(0L)))
    val perQ = hit.groupBy(col("query_id")).agg(
      sum(col("is_rel")).as("hits"),
      min(when(col("is_rel") === 1L, col("rank"))).as("first_rel_rank"),
      sum(when(col("is_rel") === 1L,
        element_at(lit(disc.toArray), col("rank").cast("int")))
        .otherwise(lit(0L))).as("dcg_milli"))
    relCount.join(perQ, Seq("query_id"), "left_outer")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr(s"coalesce(hits, 0L) * 1000 div $k").as("overlap_permille"),
        coalesce(expr("1000 div first_rel_rank"), lit(0L)).as("mrr_milli"),
        coalesce(col("dcg_milli"), lit(0L)).as("dcg_milli"),
        expr(s"coalesce(dcg_milli, 0L) * 1000 div " +
          s"element_at(array(${prefix.mkString("L,")}L), " +
          s"cast(least(n_rel, ${k}L) as int))").as("ndcg_permille"))
  }

  /** Score-normalized fusion (Fox & Shaw 1994) — the OTHER classic
    * hybrid combiner next to [[rrfFuse]]: per system and query, scores
    * min-max normalize to [0, 1] (`(s − min)/(max − min)`, 0 when the
    * query's scores are constant), then
    *
    *   CombSUM  = Σ normalized scores (absent systems contribute 0.0)
    *   CombMNZ  = CombSUM · (number of systems that retrieved the doc)
    *
    * ranked by (CombMNZ desc, doc_id asc), top `kTop`. Every double is
    * a pinned shape over the systems' own scores in the GIVEN system
    * order; the hit count is an exact integer factor.
    *
    * Scale shape: identical to [[rrfFuse]] — inputs are |queries| × k
    * rows, the min/max are per-query aggregations on them, and the
    * corpus is never touched. */
  def combFuse(systems: Seq[(String, DataFrame)], kTop: Int): DataFrame = {
    require(systems.nonEmpty, "combFuse needs at least one ranking")
    val normed = systems.map { case (n, df) =>
      val agg = df.groupBy(col("query_id"))
        .agg(min(col("score")).as("_mn"), max(col("score")).as("_mx"))
      df.join(agg, Seq("query_id"))
        .select(col("query_id"), col("doc_id"),
          when(col("_mx") > col("_mn"),
            (col("score") - col("_mn")) / (col("_mx") - col("_mn")))
            .otherwise(lit(0.0)).as(s"norm_$n"))
    }
    val joined = normed.reduce(
      (a, b) => a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    val sum = systems.map { case (n, _) =>
      coalesce(col(s"norm_$n"), lit(0.0))
    }.reduce(_ + _)
    val hits = systems.map { case (n, _) =>
      when(col(s"norm_$n").isNotNull, 1L).otherwise(0L)
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("comb_mnz").desc, col("doc_id").asc)
    joined
      .withColumn("comb_sum", sum)
      .withColumn("n_systems", hits)
      .withColumn("comb_mnz",
        col("comb_sum") * col("n_systems").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kTop)
      .select(col("query_id"), col("doc_id"), col("comb_sum"),
        col("n_systems"), col("comb_mnz"), col("rank"))
  }

  /** Pre-retrieval query-performance predictors — the IR difficulty
    * signals computed from the index statistics ALONE, before any
    * scoring (He & Ounis 2004): per query, term count, mean/min/max
    * idf (milli — min idf is the most-common term's, the classic
    * "query has a stopword" signal), Σ df, and query scope — the
    * fraction of the corpus containing ANY query term, in permille.
    * All integer; the scope count is one semi-joined distinct over the
    * probe (inverted-index lookup, corpus never scanned). */
  def queryDifficulty(post: DataFrame, queries: DataFrame, nDocs: Long,
      idCol: String = "query_id", textCol: String = "text"): DataFrame = {
    val qt = queryTerms(queries, idCol, textCol)
    val weighted = queryTermWeights(post, qt, nDocs)
    val perTerm = weighted.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_terms"),
      expr("sum(idf_milli) div count(1)").as("mean_idf_milli"),
      min(col("idf_milli")).as("min_idf_milli"),
      max(col("idf_milli")).as("max_idf_milli"),
      sum(col("df")).as("sum_df"))
    val scope = post.join(broadcast(qt), Seq("term"))
      .select(col("query_id"), col("doc_id")).distinct()
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_scope"))
    perTerm.join(scope, Seq("query_id"), "left_outer")
      .withColumn("n_scope", coalesce(col("n_scope"), lit(0L)))
      .withColumn("scope_permille",
        expr(s"n_scope * 1000 div ${nDocs}L"))
      .select(col("query_id"), col("n_terms"), col("mean_idf_milli"),
        col("min_idf_milli"), col("max_idf_milli"), col("sum_df"),
        col("n_scope"), col("scope_permille"))
  }

  /** (nDocs, avgdl) for the weighting: nDocs counts EVERY corpus doc
    * (empty ones too — they depress avgdl exactly as the oracle's
    * count(*) does); total tokens comes from the postings. Both
    * integer-exact, one double division. */
  def corpusStats(docs: DataFrame, post: DataFrame,
      idCol: String = "doc_id"): (Long, Double) = {
    val nDocs = docs.select(col(idCol)).count()
    val totalToks = post.agg(sum(col("tf"))).head().getLong(0)
    (nDocs, totalToks.toDouble / nDocs.toDouble)
  }

  /** (nDocs, avgdl) derived from the index ALONE — the incremental-
    * store path ([[graft.sources.PostingsStore]]), where the postings
    * are the source of truth for what the index holds. Counts only
    * docs with ≥1 token (an all-whitespace doc leaves no posting rows,
    * so a store can't see it — callers on corpora with empty docs must
    * carry nDocs out of band via [[corpusStats]]). One aggregation. */
  def storeStats(post: DataFrame): (Long, Double) = {
    val r = post.agg(countDistinct(col("doc_id")).as("nd"),
      sum(col("tf")).as("tt")).head()
    val nd = r.getLong(0)
    (nd, r.getLong(1).toDouble / nd.toDouble)
  }

  /** Boolean retrieval — the Lucene-BooleanQuery clause model over the
    * inverted index: per query a MUST set (every term required), a
    * SHOULD set (at least `minShouldMatch` of them required when the
    * set is non-empty), and a MUST_NOT set (any match excludes the
    * doc). `boolQueries` is (query_id, must: array, should: array,
    * must_not: array); role sets are deduplicated here, so a repeated
    * token never double-counts. A doc must match at least one
    * positive (MUST or SHOULD) term to appear at all — the standard
    * "no purely-negative queries" convention.
    *
    * Scale shape: the query side is request-sized, so every role's
    * term set rides a BROADCAST join into the postings; the only
    * corpus-touching work is the per-term posting slices the query's
    * own terms select (Σ df over query terms, never a corpus scan).
    * The positive roles fold in ONE pass — (query, doc) match counts
    * by role from a single broadcast probe — and MUST_NOT lands as a
    * left-anti join of the candidate set against the (equally
    * df-bounded) negative pairs. No windows, no corpus-keyed shuffle:
    * the one exchange is the (query_id, doc_id) match aggregation,
    * sized by matched postings. Output is unranked (the boolean
    * model), totally ordered by (query_id, doc_id), with the matched
    * role counts alongside for downstream scoring. */
  def booleanRetrieve(post: DataFrame, boolQueries: DataFrame,
      minShouldMatch: Int = 1): DataFrame = {
    require(minShouldMatch >= 1,
      s"minShouldMatch must be at least 1, got $minShouldMatch")
    def role(c: String): DataFrame = boolQueries
      .select(col("query_id"), explode(array_distinct(col(c))).as("term"))
    val must = role("must")
    val should = role("should")
    // clause cardinalities per query — query-sized, broadcast below
    val nMust = must.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_must"))
    val nShould = should.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_should"))
    val positive = must.withColumn("role", lit("m"))
      .unionByName(should.withColumn("role", lit("s")))
    // one broadcast probe: (query, doc) with per-role distinct-term
    // match counts (post holds one row per (doc, term), positive one
    // per (query, role, term) — counts are distinct by construction)
    val matched = post.select(col("doc_id"), col("term"))
      .join(broadcast(positive), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        sum(when(col("role") === "m", 1L).otherwise(0L)).as("must_matched"),
        sum(when(col("role") === "s", 1L).otherwise(0L)).as("should_matched"))
    val candidates = matched
      .join(broadcast(nMust), Seq("query_id"), "left_outer")
      .join(broadcast(nShould), Seq("query_id"), "left_outer")
      .withColumn("n_must", coalesce(col("n_must"), lit(0L)))
      .withColumn("n_should", coalesce(col("n_should"), lit(0L)))
      .filter(col("must_matched") === col("n_must") &&
        (col("n_should") === 0L ||
          col("should_matched") >= lit(minShouldMatch.toLong)))
    val notPairs = post.select(col("doc_id"), col("term"))
      .join(broadcast(role("must_not")), Seq("term"))
      .select(col("query_id"), col("doc_id")).distinct()
    candidates.join(notPairs, Seq("query_id", "doc_id"), "left_anti")
      .select(col("query_id"), col("doc_id"),
        col("must_matched"), col("should_matched"))
  }

  /** Field-tagged postings for BM25F: one row per (doc, term) with
    * per-field term frequencies and field lengths. Fields here are
    * positional — `title` = the first `titleLen` tokens, `body` = the
    * rest — the deterministic split the corpus schema affords (a real
    * multi-field source supplies its own field postings in this
    * shape). Same one-pass build as [[postings]]: explode both field
    * slices with a tag, pivot the tag into (tf_t, tf_b), re-derive
    * field lengths as the per-doc tf sums. */
  def bm25fPostings(docs: DataFrame, titleLen: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(titleLen >= 1, s"titleLen must be positive, got $titleLen")
    val ts = graft.functions.TextFunctions.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), ts.as("ts"))
    val title = base.select(col("doc_id"),
      explode(slice(col("ts"), 1, titleLen)).as("term"), lit("t").as("fld"))
    val body = base.filter(size(col("ts")) > titleLen)
      .select(col("doc_id"),
        explode(slice(col("ts"), lit(titleLen + 1),
          size(col("ts")) - titleLen)).as("term"), lit("b").as("fld"))
    val tf = title.unionByName(body)
      .groupBy(col("doc_id"), col("term"))
      .agg(sum(when(col("fld") === "t", 1L).otherwise(0L)).as("tf_t"),
        sum(when(col("fld") === "b", 1L).otherwise(0L)).as("tf_b"))
    val fl = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf_t")).as("fl_t"), sum(col("tf_b")).as("fl_b"))
    tf.join(fl, Seq("doc_id"))
  }

  /** (nDocs, avg title length, avg body length) for BM25F weighting —
    * nDocs counts every corpus doc (the [[corpusStats]] convention),
    * field averages are total field tokens over nDocs. */
  def bm25fStats(docs: DataFrame, fpost: DataFrame,
      idCol: String = "doc_id"): (Long, Double, Double) = {
    val nDocs = docs.select(col(idCol)).count()
    val r = fpost.agg(sum(col("tf_t")).as("tt"), sum(col("tf_b")).as("tb"))
      .head()
    (nDocs, r.getLong(0).toDouble / nDocs.toDouble,
      r.getLong(1).toDouble / nDocs.toDouble)
  }

  /** BM25F (Robertson, Zaragoza, Taylor 2004 — the "simple BM25F"
    * form): per-field length-normalized term frequencies
    * tfn_f = tf_f / ((1−b) + b·(fl_f/avgfl_f)), combined across
    * fields with integer field weights (title counts `wT`-fold), then
    * ONE saturation over the combined wtf — the defining difference
    * from score-summing per field (which would saturate each field
    * separately and over-reward a term that merely appears
    * everywhere). Contribution = idf · wtf/(k1 + wtf), idf the q153
    * integer milli proxy with df counted over EITHER field; same
    * broadcast probe + term-ascending fold + rank machinery as
    * [[bm25TopK]]. */
  def bm25fTopK(fpost: DataFrame, queries: DataFrame, nDocs: Long,
      avgT: Double, avgB: Double, kTop: Int, wT: Int = 2, wB: Int = 1,
      idCol: String = "query_id", textCol: String = "text"): DataFrame = {
    val weighted = queryTermWeights(fpost,
      queryTerms(queries, idCol, textCol), nDocs)
    def tfn(tf: Column, fl: Column, avg: Double): Column =
      tf.cast("double") /
        (lit(OneMinusB) + lit(B) * (fl.cast("double") / lit(avg)))
    val wtf = lit(wT.toDouble) * tfn(col("tf_t"), col("fl_t"), avgT) +
      lit(wB.toDouble) * tfn(col("tf_b"), col("fl_b"), avgB)
    val contrib = col("idf_milli").cast("double") * (wtf / (lit(K1) + wtf))
    foldRankSelect(fpost, weighted, contrib, kTop, candidates = None)
  }

  /** Snippet generation — materialize the text of [[bestPassages]]
    * windows: for each (query, doc, window_start) the winW-token
    * window is sliced out of the document and emitted both raw
    * (`snippet`) and with every query term bracket-highlighted
    * (`highlighted`, terms wrapped in `[...]`) — the result-page
    * surface on top of the passage scorer. One narrow pass: the
    * passage toplist and the per-query term sets (both request-sized)
    * broadcast into the document scan, the slice and highlight are
    * row-local array ops, and only docs ON the toplist survive the
    * join — the corpus contributes exactly the rows being served. */
  def snippets(passages: DataFrame, docs: DataFrame, queries: DataFrame,
      winW: Int, idCol: String = "query_id",
      textCol: String = "text"): DataFrame = {
    require(winW >= 1, s"winW must be positive, got $winW")
    val qsets = queryTerms(queries, idCol, textCol)
      .groupBy(col("query_id"))
      .agg(sort_array(collect_set(col("term"))).as("qterms"))
    docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col(textCol)).as("ts"))
      .join(broadcast(passages.select(col("query_id"), col("doc_id"),
        col("window_start"), col("rank"))), Seq("doc_id"))
      .join(broadcast(qsets), Seq("query_id"))
      .withColumn("win",
        slice(col("ts"), col("window_start").cast("int"), lit(winW)))
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("window_start"),
        array_join(col("win"), " ").as("snippet"),
        array_join(transform(col("win"), t =>
          when(array_contains(col("qterms"), t),
            concat(lit("["), t, lit("]"))).otherwise(t)), " ")
          .as("highlighted"))
  }

  /** Faceted counts over a retrieval candidate set — the search-UI
    * sidebar aggregation: for each query, how many of its matching
    * docs fall in each value of each facet column. One pass: the doc
    * metadata melts to (doc_id, facet, value) rows (`facets` names
    * metadata columns of `docs`), joins the candidate pairs on
    * doc_id, and a single group-by counts — the candidate frame is
    * read once however many facets are requested. The join keys on
    * doc_id and is candidate-bounded on one side; at serving scale
    * the candidates broadcast, at audit scale AQE picks the shuffle
    * join — either way no corpus-sized exchange beyond the facet
    * melt itself (|facets| × docs rows, column-pruned to the facet
    * columns). */
  def facetCounts(candidates: DataFrame, docs: DataFrame,
      facets: Seq[String], idCol: String = "doc_id"): DataFrame = {
    require(facets.nonEmpty, "facetCounts needs at least one facet column")
    val melted = docs.select(col(idCol).as("doc_id"),
      explode(map(facets.flatMap(f => Seq(lit(f), col(f))): _*))
        .as(Seq("facet", "value")))
    candidates.select(col("query_id"), col("doc_id"))
      .join(melted, Seq("doc_id"))
      .groupBy(col("query_id"), col("facet"), col("value"))
      .agg(count(lit(1)).as("cnt"))
  }
}
