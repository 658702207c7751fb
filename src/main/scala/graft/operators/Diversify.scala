package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Result diversification — Maximal Marginal Relevance (Carbonell &
  * Goldstein 1998): greedily re-rank a candidate list so each pick
  * trades relevance against similarity to what is already picked,
  *
  *   MMR(d) = λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)
  *
  * the standard de-redundancy pass over a dense top-k before the
  * results (or training examples) are consumed.
  *
  * Scale shape: candidates arrive ALREADY top-k-bounded per query
  * (|queries| × k rows — corpus-independent), so the greedy loop is a
  * per-query computation over ≤ k items with ≤ k·m similarity
  * evaluations. It runs as `flatMapGroups` over the query key — the
  * idiomatic Spark home for small-state per-key sequential algorithms —
  * and the corpus is never touched (the candidate generator paid that).
  *
  * Determinism contract: λ enters as INTEGER milli and becomes a double
  * only via the pinned `milli/1000.0` shape; sim is the
  * [[Similarity]] cosine — elementwise float→double products folded in
  * INDEX order seeded 0.0, `dot/(√·√)`, 0 on a zero norm; `max` over
  * the selected set is order-free; candidates are scanned doc-id
  * ASCENDING with a strict `>` so every tie resolves to the lower
  * doc_id. The first pick uses the same formula with an empty selected
  * set (maxsim = 0), so both engines order step 1 by the identical
  * λ·rel double. The oracle is `m` unrolled greedy-selection CTE
  * levels over the same pinned expressions. */
object Diversify {

  /** `cands`: (query_id, doc_id, rel, emb) — per-query candidates with
    * relevance scores and their embedding vectors (array&lt;float&gt;).
    * Returns (query_id, doc_id, rel, maxsim, rank) for the `m` picks
    * per query, rank 1..m in selection order; `maxsim` is the
    * similarity penalty the pick paid (0 for the first). */
  def mmrSelect(cands: DataFrame, m: Int,
      lambdaMilli: Long = 700L): DataFrame = {
    require(m >= 1, s"m must be positive, got $m")
    require(lambdaMilli >= 0L && lambdaMilli <= 1000L,
      s"lambdaMilli must be in [0, 1000], got $lambdaMilli")
    val spark = cands.sparkSession
    import spark.implicits._
    val lam = lambdaMilli.toDouble / 1000.0
    val om = (1000L - lambdaMilli).toDouble / 1000.0
    val ds: Dataset[(Long, Long, Double, Seq[Float])] = cands
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("rel").cast("double"), col("emb"))
      .as[(Long, Long, Double, Seq[Float])]
    ds.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // doc-id ascending scan order makes every argmax tie-stable
        val cs = it.toVector.sortBy(_._2)
        def cos(a: Seq[Float], b: Seq[Float]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
          i = 0
          while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
          i = 0
          while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
          val den = math.sqrt(na) * math.sqrt(nb)
          if (den > 0) d / den else 0.0
        }
        val selected = Vector.newBuilder[(Long, Long, Double, Double, Int)]
        var sel = Vector.empty[Int]
        var rank = 1
        val taken = scala.collection.mutable.BitSet.empty
        while (rank <= m && taken.size < cs.size) {
          var bestI = -1; var bestScore = 0.0; var bestMs = 0.0
          var i = 0
          while (i < cs.size) {
            if (!taken(i)) {
              val c = cs(i)
              // true max over the selected set (cosines can be negative;
              // SQL max() would surface them) — 0.0 only when S is empty
              val ms =
                if (sel.isEmpty) 0.0
                else sel.iterator.map(j => cos(c._4, cs(j)._4)).max
              val score = lam * c._3 - om * ms
              if (bestI < 0 || score > bestScore) {
                bestI = i; bestScore = score; bestMs = ms
              }
            }
            i += 1
          }
          taken += bestI
          sel = sel :+ bestI
          val c = cs(bestI)
          selected += ((qid, c._2, c._3, bestMs, rank))
          rank += 1
        }
        selected.result()
      }
      .toDF("query_id", "doc_id", "rel", "maxsim", "rank")
  }
}
