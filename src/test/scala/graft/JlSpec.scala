package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Jl, Pca, Similarity}

/** JL projection invariants: exact-integer coordinates equal a
  * sequential witness bitwise, a total shortlist degenerates the
  * coarse-to-fine probe to brute force, and the guards are loud. */
class JlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("jl-spec", "4").getOrCreate()
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextInt(2000) - 1000) / 997.0)))
  }

  test("project == sequential witness (signs × quantized integers)") {
    val dim = 8
    val td = 3
    val vecs = randomVecs(50, dim, 198L)
    val signs = Jl.signMatrix(td, dim)
    val expected = vecs.map { case (id, v) =>
      val q = v.map(x => math.floor(x * Pca.QuantScale + 0.5).toLong)
      id -> Array.tabulate(td) { t =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += signs(t)(j) * q(j); j += 1 }
        acc
      }.toSeq
    }.toMap
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val got = Jl.project(df, td, dim).collect()
    assert(got.length == 50)
    got.foreach { r =>
      assert(r.getSeq[Long](1) == expected(r.getLong(0)),
        s"projection diverged at id ${r.getLong(0)}")
    }
    // signs are genuinely mixed (not all one value)
    val flat = signs.flatten
    assert(flat.contains(1) && flat.contains(-1))
  }

  test("jlTopK with a total shortlist == brute-force cosine top-k") {
    val vecs = randomVecs(40, 8, 199L)
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 6)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(r.length - 1), r.getLong(1), r.getDouble(2))
    val brute = Similarity.bruteForceTopK(queries, df, k = 5)
      .collect().map(key).toSet
    val jl = Jl.jlTopK(queries, df, targetDim = 4, dim = 8,
      shortK = 40, k = 5).collect().map(key).toSet
    assert(jl == brute)
    assert(jl.nonEmpty)
  }

  test("geometry guards are loud") {
    val df = randomVecs(5, 8, 200L)
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Jl.project(df, targetDim = 9, dim = 8)
    }
    assert(e1.getMessage.contains("targetDim"))
    val e2 = intercept[IllegalArgumentException] {
      Jl.jlTopK(df, df, targetDim = 4, dim = 8, shortK = 2, k = 5)
    }
    assert(e2.getMessage.contains("must cover"))
  }
}
