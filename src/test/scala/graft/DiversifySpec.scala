package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Diversify

/** MMR invariants on hand-built geometry: a near-duplicate of the top
  * pick is deferred in favor of a diverse lower-relevance candidate;
  * λ=1000 degenerates to pure relevance order; picks are distinct and
  * rank-contiguous. */
class DiversifySpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("diversify-spec", "4").getOrCreate()
  import spark.implicits._

  // doc 1: relevance 0.95, axis e1; doc 2: relevance 0.94, ALSO e1 (a
  // clone of doc 1); doc 3: relevance 0.60, axis e2 (orthogonal).
  // Pure relevance orders 1, 2, 3; MMR at λ=0.7 must pick 1, then 3
  // (doc 2's penalty (1−λ)·1.0 = 0.3 sinks its 0.7·0.94), then 2.
  private val cands = Seq(
    (0L, 1L, 0.95, Seq(1f, 0f)),
    (0L, 2L, 0.94, Seq(1f, 0f)),
    (0L, 3L, 0.60, Seq(0f, 1f)))

  test("MMR defers the near-duplicate, λ=1000 restores relevance order") {
    val df = cands.toDF("query_id", "doc_id", "rel", "emb")
    val got = Diversify.mmrSelect(df, m = 3, lambdaMilli = 700L)
      .collect().sortBy(_.getInt(4))
      .map(r => (r.getLong(1), r.getInt(4), r.getDouble(3)))
    assert(got.map(x => (x._1, x._2)).toSeq ===
      Seq((1L, 1), (3L, 2), (2L, 3)), got.toSeq.toString)
    // penalties: first pick 0; doc 3 orthogonal to doc 1 → 0; doc 2 is
    // doc 1's exact clone → cosine exactly 1.0
    assert(got.map(_._3).toSeq === Seq(0.0, 0.0, 1.0))
    val pure = Diversify.mmrSelect(df, m = 3, lambdaMilli = 1000L)
      .collect().sortBy(_.getInt(4)).map(_.getLong(1)).toSeq
    assert(pure === Seq(1L, 2L, 3L))
  }

  test("ties resolve to the lower doc_id and picks stay distinct") {
    // two identical candidates: same rel, same vector — rank order must
    // be doc-id ascending, each picked exactly once
    val df = Seq(
      (7L, 5L, 0.5, Seq(1f, 1f)),
      (7L, 4L, 0.5, Seq(1f, 1f))).toDF("query_id", "doc_id", "rel", "emb")
    val got = Diversify.mmrSelect(df, m = 5, lambdaMilli = 700L)
      .collect().sortBy(_.getInt(4)).map(_.getLong(1)).toSeq
    assert(got === Seq(4L, 5L))
  }

  test("mmrSelect rejects bad parameters") {
    val df = cands.toDF("query_id", "doc_id", "rel", "emb")
    intercept[IllegalArgumentException](Diversify.mmrSelect(df, m = 0))
    intercept[IllegalArgumentException](
      Diversify.mmrSelect(df, m = 1, lambdaMilli = -1L))
  }
}
