package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphRank

/** PageRank invariants: the distributed power iteration equals a plain
  * sequential witness BIT-FOR-BIT (same pinned arithmetic — integer
  * milli damping, src-ascending in-flow folds — no shared mechanism);
  * the TextRank edge derivation equals hand-counted bigrams; total rank
  * mass is conserved (no dangling nodes on a symmetrized graph). */
class GraphRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("graphrank-spec", "4").getOrCreate()
  import spark.implicits._

  /** Sequential witness: arrays and loops, the SAME pinned shapes —
    * base + damp·Σ(r·frac) with the Σ folded src-ascending. */
  private def witnessPageRank(edges: Seq[(String, String, Long)],
      iters: Int, dampMilli: Long): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val damp = dampMilli.toDouble / 1000.0
    val base = (1000L - dampMilli).toDouble / 1000.0 / n.toDouble
    val outW: Map[String, Long] =
      edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val frac: Map[(String, String), Double] = edges.map { case (s, d, w) =>
      (s, d) -> w.toDouble / outW(s).toDouble
    }.toMap
    var r: Map[String, Double] = nodes.map(_ -> 1.0 / n.toDouble).toMap
    for (_ <- 1 to iters) {
      r = nodes.map { v =>
        // src-ascending fold, seeded 0.0 — the engine's association
        var acc = 0.0
        edges.filter(_._2 == v).map(e => (e._1, r(e._1) * frac((e._1, v))))
          .sortBy(_._1).foreach { case (_, c) => acc += c }
        v -> (base + damp * acc)
      }.toMap
    }
    r
  }

  private val edges = Seq(
    ("a", "b", 3L), ("b", "a", 3L),
    ("b", "c", 1L), ("c", "b", 1L),
    ("c", "d", 2L), ("d", "c", 2L),
    ("a", "c", 1L), ("c", "a", 1L))

  test("pageRank equals the sequential witness bit-for-bit") {
    val got = GraphRank.pageRank(
      edges.toDF("src", "dst", "w"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = witnessPageRank(edges, iters = 10, dampMilli = 850L)
    assert(got == want, s"$got vs $want")
  }

  test("pageRank conserves total mass on a symmetrized graph") {
    val got = GraphRank.pageRank(edges.toDF("src", "dst", "w"), iters = 10)
      .agg(sum(col("r"))).head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12, s"mass $got")
  }

  test("pageRank rejects bad parameters") {
    val e = edges.toDF("src", "dst", "w")
    intercept[IllegalArgumentException](GraphRank.pageRank(e, iters = 0))
    intercept[IllegalArgumentException](
      GraphRank.pageRank(e, iters = 1, dampMilli = 1001L))
  }

  test("collocations equal the hand-computed association ratios") {
    val docs = Seq(
      (0L, "a b a b"),     // {a,b} ×3
      (1L, "b a c c a b")  // {a,b} ×2, {a,c} ×2, (c,c) dropped
    ).toDF("doc_id", "text")
    // N = 10; c_a = 4, c_b = 4, c_c = 2
    // {a,b}: 5·10·1000 div 16 = 3125; {a,c}: 2·10·1000 div 8 = 2500
    val got = GraphRank.collocations(docs, minCount = 2L, kTop = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
      .toSeq.sortBy(_._7)
    val want = Seq(
      ("a", "b", 5L, 4L, 4L, 3125L, 1),
      ("a", "c", 2L, 4L, 2L, 2500L, 2))
    assert(got == want, s"$got")
  }

  test("textRankEdges equals hand-counted symmetric bigrams") {
    val docs = Seq(
      (0L, "a b a"),    // bigrams (a,b), (b,a) → undirected {a,b} ×2
      (1L, "b b c"),    // (b,b) self-loop DROPPED, (b,c)
      (2L, "c"),        // no bigram
      (3L, "")          // no tokens
    ).toDF("doc_id", "text")
    val got = GraphRank.textRankEdges(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = Set(
      ("a", "b", 2L), ("b", "a", 2L),
      ("b", "c", 1L), ("c", "b", 1L))
    assert(got == want, s"$got")
  }
}
