package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with ±1 (Achlioptas 2003)
  * signs — the cheap dimensionality cut in front of LSH/ANN: a dim-64
  * vector becomes a dim-16 integer vector at 4× less scan width, with
  * pairwise distances preserved in expectation (the JL lemma for
  * sign matrices). Deterministic and EXACT end to end:
  *
  *   - the sign matrix s(t, j) ∈ {−1, +1} is a pure function of
  *     (t, j) through the [[graft.functions.KppInit.mix]] splitmix64
  *     finalizer under a dedicated stream seed — no stored model, any
  *     engine reproduces it from the contract (the oracle reads it as
  *     a fixture parquet, the q149 witness discipline);
  *   - inputs are the [[Pca.quantize]] integers, so coordinate
  *     t = Σ_j s(t,j)·q_j is an exact integer sum — order-free,
  *     mergeable, no float anywhere;
  *   - projection is ONE narrow codegen'd pass (the sign rows are
  *     expression literals; nothing joins, nothing shuffles).
  *
  * Coarse distances in projected space stay exact: coordinates are
  * ≤ dim·qmax ≈ 2^16 here, so squared-L2 folds of longs are exact in
  * doubles — [[jlTopK]] ranks a 4×-narrower scan, then re-ranks only
  * the shortlist at full width (the [[Similarity.prefixRefineTopK]]
  * refine shape with a JL coarse pass instead of a prefix). */
object Jl {

  /** Dedicated sign-stream seed (the KppInit.Seed convention). */
  val SignSeed: Long = 0x6A6C7369676E7331L

  /** s(t, j): +1 when the top bit of mix((t·2^20 + j) ^ seed) is 0. */
  def sign(t: Int, j: Int): Int = {
    val z = graft.functions.KppInit.mix((t.toLong << 20 | j.toLong) ^ SignSeed)
    if (z >= 0) 1 else -1
  }

  /** The full ±1 matrix — tiny (targetDim × dim ints); the fixture
    * writer and the witness both read it from here. */
  def signMatrix(targetDim: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(targetDim, dim)(sign)

  /** (id, proj): dim → targetDim exact-integer projection in one
    * narrow pass. */
  def project(corpus: DataFrame, targetDim: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(targetDim >= 1 && dim >= 1 && targetDim <= dim,
      s"targetDim=$targetDim must be in [1, dim=$dim]")
    require(dim < (1 << 20), s"dim=$dim exceeds the sign-stream key space")
    val signs = signMatrix(targetDim, dim)
    // hoist the quantized array to an ATTRIBUTE before any lambda
    // touches it (the institutional rule): handing the transform
    // expression itself to 16 × 64 element_at calls re-evaluates the
    // whole quantization per lookup — measured 300 s → 1.5 s at sf1.0
    val qd = corpus.select(col(idCol).as("id"), quantizeCol(vecCol).as("qa"))
    val coords = (0 until targetDim).map { t =>
      val sLit = array(signs(t).map(s => lit(s.toLong)): _*)
      aggregate(sequence(lit(0), lit(dim - 1)), lit(0L),
        (acc, j) => acc +
          element_at(sLit, (j + 1).cast("int")) *
          element_at(col("qa"), (j + 1).cast("int")))
    }
    qd.select(col("id"), array(coords: _*).as("proj"))
  }

  private def quantizeCol(vecCol: String): Column =
    transform(col(vecCol),
      x => floor(x.cast("double") * Pca.QuantScale + 0.5).cast("long"))

  /** Coarse-to-fine ANN through the projection: rank the corpus by
    * exact squared L2 in JL space (a targetDim/dim-width scan), keep
    * `shortK` per query, re-rank the shortlist by full-width cosine.
    * Coarse ties (jl_dist asc, id asc); final (cosine desc, id asc);
    * self-matches excluded. The projected distances are integer-exact
    * doubles, so the shortlist is deterministic on any engine. */
  def jlTopK(queries: DataFrame, corpus: DataFrame, targetDim: Int,
      dim: Int, shortK: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortK >= k, s"shortK=$shortK must cover k=$k")
    val qp = project(queries, targetDim, dim, idCol, vecCol)
      .select(col("id").as("query_id"), col("proj").as("qp"))
    val cp = project(corpus, targetDim, dim, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("proj").as("cp"))
    val coarseW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("jl_dist").asc, col("neighbor_id").asc)
    val short = cp.join(broadcast(qp), col("query_id") =!= col("neighbor_id"))
      .withColumn("jl_dist",
        graft.functions.VectorExpressions.sqDist(col("qp"), col("cp")))
      .withColumn("crank", row_number().over(coarseW))
      .filter(col("crank") <= shortK)
      .select(col("query_id"), col("neighbor_id"), col("jl_dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    short
      .join(corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cv")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .withColumn("cosine", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("jl_dist"), col("rank"))
  }
}
