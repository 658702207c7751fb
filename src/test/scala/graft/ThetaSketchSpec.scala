package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ThetaSketch

/** KMV sketch invariants: the distributed estimate equals a plain
  * sequential witness (MessageDigest + the h60 convention + the same
  * integer quotient — no shared mechanism); slices under k report
  * exactly; intersections are exact in the exact regime. */
class ThetaSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("theta-spec", "4").getOrCreate()
  import spark.implicits._

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  test("kmvEstimate equals the sequential witness, exact under k") {
    val big = (1 to 500).map(i => ("big", s"item-$i"))
    val small = (1 to 7).map(i => ("small", s"item-$i"))
    val hashes = ThetaSketch.sliceHashes((big ++ small)
      .toDF("slice", "item"))
    val k = 16
    val got = ThetaSketch.kmvEstimate(hashes, k)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getLong(3))).toMap
    // witness: sort the 60-bit hashes, take the k-th, integer quotient
    val hs = big.map(_._2).distinct.map(h60).sorted
    val theta = hs(k - 1)
    val est = (java.math.BigInteger.valueOf(k - 1)
      .multiply(java.math.BigInteger.ONE.shiftLeft(60)))
      .divide(java.math.BigInteger.valueOf(theta)).longValueExact()
    assert(got("big") == ((500L, Some(theta), est)), got("big").toString)
    // a k=16 sketch of 500 distinct items lands within ~3/sqrt(k)
    assert(math.abs(est - 500L) < 400L, s"est $est wildly off")
    // under k: theta undefined, estimate EXACT
    assert(got("small") == ((7L, None, 7L)))
  }

  test("intersections are exact in the exact regime, estimated above it") {
    // a ∩ b = items 50-99 (50 shared); both slices (100 distinct) are
    // under k=128 → the exact regime
    val a = (0 to 99).map(i => ("a", s"x-$i"))
    val b = (50 to 149).map(i => ("b", s"x-$i"))
    val hashes = ThetaSketch.sliceHashes((a ++ b).toDF("slice", "item"))
    val exact = ThetaSketch.kmvIntersections(hashes, k = 128)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(exact == Seq(("a", "b", 50L, 50L, 0L)), exact.toString)
    // above k the estimate engages: same data, k=16 → theta-bounded
    val est = ThetaSketch.kmvIntersections(hashes, k = 16)
      .collect().map(r => (r.getLong(4), r.getLong(5))).head
    assert(est._2 == 50L)
    assert(est._1 > 0L, "estimate must see the real overlap")
  }

  /** Four slices spanning every pairwise regime combination:
    * big (500) / mid (300, overlapping big) / small (7) / tiny (5). */
  private def regimeHashes = {
    val rows = (1 to 500).map(i => ("big", s"x-$i")) ++
      (200 to 499).map(i => ("mid", s"x-$i")) ++
      (1 to 7).map(i => ("small", s"x-$i")) ++
      (1000 to 1004).map(i => ("tiny", s"x-$i"))
    ThetaSketch.sliceHashes(rows.toDF("slice", "item"))
  }

  test("sketch-only intersections equal the exact-path estimates bitwise") {
    val hashes = regimeHashes
    for (k <- Seq(16, 128)) {
      val sk = ThetaSketch.kmvSketch(hashes, k)
      // the k-row bound the scale argument rests on
      val maxRows = sk.groupBy("slice").count()
        .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
      assert(maxRows <= k, s"sketch exceeded k=$k rows: $maxRows")
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getString(1), Option(r.get(2)),
          r.getLong(3), r.getLong(4))
      val exact = ThetaSketch.kmvIntersections(hashes, k)
        .select("slice_a", "slice_b", "theta_ab", "c_below", "est_inter")
        .collect().map(key).toSet
      val sketchOnly = ThetaSketch.kmvIntersectionsSketchOnly(sk, k)
        .collect().map(key).toSet
      assert(sketchOnly == exact,
        s"k=$k sketch-only diverged:\n$sketchOnly\nvs\n$exact")
      assert(sketchOnly.size == 6, "4 slices -> 6 pairs")
    }
  }

  test("union of sketches == sketch of the union (mergeability law)") {
    val hashes = regimeHashes
    val slices = Seq("big", "mid", "small", "tiny")
    for (k <- Seq(16, 128)) {
      val got = ThetaSketch.kmvUnions(ThetaSketch.kmvSketch(hashes, k), k)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))).toMap
      assert(got.size == 6)
      // the other side of the law: a FRESH sketch over the pair's full
      // union hash set, through kmvEstimate (no merge mechanism shared)
      for (a <- slices; b <- slices if a < b) {
        val unionHashes = hashes
          .filter(col("slice").isin(a, b))
          .select(lit(s"$a|$b").as("slice"), col("h")).distinct()
        val w = ThetaSketch.kmvEstimate(unionHashes, k).head()
        val want = (Option(w.get(2)).map(_.asInstanceOf[Long]), w.getLong(3))
        assert(got((a, b)) == want,
          s"k=$k pair ($a,$b): merged ${got((a, b))} != fresh $want")
      }
      // regime sanity: small∪tiny (12 distinct) is exact at both ks
      assert(got(("small", "tiny")) == ((None, 12L)))
    }
  }
}
