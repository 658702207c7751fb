package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Coreset

/** Gonzalez k-center selection: hand-computed rounds on a 1-D corpus,
  * determinism of ties, monotone radius, duplicate saturation.
  */
class CoresetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("coreset-spec", "4").getOrCreate()
  import spark.implicits._

  private def corpus(points: (Long, Float)*) =
    points.toSeq.map { case (id, x) => (id, Array(x)) }
      .toDF("vec_id", "embedding")

  test("k-center: hand-computed selections and radius on a 1-D corpus") {
    // positions 0, 10, 1, 9, 5 -> codes 0, 10240, 1024, 9216, 5120.
    // seed id1; round 2 argmax id2 (10240^2); after fold the farthest
    // remaining is id5 (5120^2); final radius = 1024^2 (ids 3 and 4).
    val df = corpus(1L -> 0f, 2L -> 10f, 3L -> 1f, 4L -> 9f, 5L -> 5f)
    val out = Coreset.kCenter(df, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 1048576L),
      (2L, 2L, 104857600L, 1048576L),
      (3L, 5L, 26214400L, 1048576L)), out.mkString(", "))
  }

  test("k-center: radius is non-increasing in k; selections stay distinct") {
    val df = corpus((1L to 40L).map(i =>
      i -> (((i * 37) % 19).toFloat / 3f)): _*)
    val radii = (1 to 6).map { k =>
      val rows = Coreset.kCenter(df, k).collect()
      val ids = rows.map(_.getLong(1))
      assert(ids.distinct.length == k, s"k=$k duplicate selection")
      rows.head.getLong(3)
    }
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"radius must not grow with k: $radii")
  }

  test("k-center: duplicate-saturated corpus falls back to lowest unselected id") {
    // 2 distinct positions, k=3: the third center must be a DUPLICATE
    // of an existing one — the explicit unselected-exclusion keeps the
    // selection well-defined (lowest id among the mind-0 remainder).
    val df = corpus(1L -> 0f, 2L -> 0f, 3L -> 7f, 4L -> 7f)
    val out = Coreset.kCenter(df, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out(0) == ((1L, 1L, 0L)))
    assert(out(1)._2 == 3L, s"round 2 should take the far cluster: ${out(1)}")
    assert(out(2) == ((3L, 2L, 0L)), s"duplicate fallback: ${out(2)}")
  }

  test("k-center: empty corpus and k > distinct ids fail with actionable errors") {
    val empty = corpus()
    val e1 = intercept[IllegalArgumentException] { Coreset.kCenter(empty, k = 2) }
    assert(e1.getMessage.contains("empty corpus"), e1.getMessage)
    // 3 rows but only 2 DISTINCT ids (the exclusion is id-based): k = 3
    // exhausts the pool mid-loop and must say so, not throw a bare
    // ArrayIndexOutOfBounds
    val dupIds = Seq((1L, Array(0f)), (1L, Array(0f)), (2L, Array(7f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] { Coreset.kCenter(dupIds, k = 3) }
    assert(e2.getMessage.contains("exceeds the corpus's 2 distinct"),
      e2.getMessage)
  }
}
