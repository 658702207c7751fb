package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfAnn, Similarity}

/** IVF-ANN invariants: full probe degenerates to exact brute force;
  * partial probe returns true neighbors with exact scores. */
class IvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("ivf-spec", "4").getOrCreate()

  private def embeddings = graft.core.Tables(spark, "/root/testdata/sf0.001").embeddings

  test("nprobe == nlist reproduces brute-force exactly") {
    implicit val s: SparkSession = spark
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 5)
    val index = IvfAnn.build(corpus, nlist = 8)
    val ivf = IvfAnn.topK(queries, index, k = 10, nprobe = 8)
      .select("query_id", "neighbor_id", "cosine", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val brute = Similarity.bruteForceTopK(queries, corpus, k = 10)
      .select("query_id", "neighbor_id", "cosine", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(ivf == brute)
  }

  test("partial probe returns a subset of true neighbors with exact scores") {
    implicit val s: SparkSession = spark
    val corpus = embeddings
    val queries = corpus.filter(col("vec_id") < 3)
    val index = IvfAnn.build(corpus, nlist = 8)
    val brute = Similarity.bruteForceTopK(queries, corpus, k = 200)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = IvfAnn.topK(queries, index, k = 10, nprobe = 2).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && brute(key) == r.getDouble(2))
    }
  }
}
