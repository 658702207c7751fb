package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV ("theta") sketches — the k-minimum-values distinct sketch
  * (Bar-Yossef 2002; the Apache DataSketches theta family) and its
  * defining advantage over HLL: sketches INTERSECT. For keyed slices
  * of an item universe, estimate per-slice distinct counts and
  * pairwise intersection cardinalities from k hashes per slice —
  * the corpus-overlap diagnostic (shared shingles between language
  * slices, leaked spans between train and eval, …) that runs on
  * sketch-sized state at any corpus size.
  *
  * Determinism contract: the hash is the repo's h60 convention — the
  * first 15 hex chars of md5(item) as a 60-bit integer (`conv` here,
  * `CAST(concat('0x', …) AS BIGINT)` in the oracle) — and every
  * estimate is an exact integer quotient: est = (k−1)·2^60 div θ with
  * θ the k-th smallest hash (EXCLUSIVE threshold), intersection
  * est = c·2^60 div θ∩ with θ∩ = min(θ_a, θ_b) and c the common
  * hashes strictly below it. Products run in DECIMAL(38,0) (HUGEINT
  * in the oracle) — (k−1)·2^60 exceeds int64 for k > 8. Slices with
  * fewer than k distinct items report their EXACT count (θ undefined
  * — the standard KMV exact regime).
  *
  * Scale shape: one distinct-aggregation over (slice, item) — the only
  * corpus-sized step — then per-slice windows keep k rows each; every
  * pairwise estimate joins k-row sketches. At 100 TB the sketches are
  * a few KB per slice and the pairwise stage is slice-count², not
  * corpus-anything. */
object ThetaSketch {

  val HashRange: java.math.BigDecimal =
    new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(60))

  /** (slice, h) — distinct 60-bit item hashes per slice. */
  def sliceHashes(items: DataFrame, sliceCol: String = "slice",
      itemCol: String = "item"): DataFrame =
    items.select(col(sliceCol).as("slice"),
      conv(substring(md5(col(itemCol).cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .distinct()

  /** Per-slice KMV summary: exact distinct count (n), θ = the k-th
    * smallest hash when n ≥ k (null otherwise), and the estimate
    * (k−1)·2^60 div θ — or the exact n in the small regime. */
  def kmvEstimate(hashes: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("slice")).orderBy(col("h").asc)
    val theta = hashes.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === k)
      .select(col("slice"), col("h").as("theta"))
    hashes.groupBy(col("slice")).agg(count(lit(1)).as("n_distinct"))
      .join(theta, Seq("slice"), "left_outer")
      .withColumn("est_distinct",
        when(col("theta").isNull, col("n_distinct")).otherwise(
          expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * " +
            s"CAST($HashRange AS DECIMAL(38,0))) div " +
            "CAST(theta AS DECIMAL(38,0)) AS BIGINT)")))
      .select(col("slice"), col("n_distinct"), col("theta"),
        col("est_distinct"))
  }

  /** Pairwise slice-intersection estimates (slice_a < slice_b):
    * θ∩ = min(θ_a, θ_b), c = common hashes strictly below θ∩,
    * est = c·2^60 div θ∩ — alongside the exact intersection and the
    * permille error vs it. Slices in the exact regime (θ null)
    * intersect exactly (their full hash sets are below any θ). */
  def kmvIntersections(hashes: DataFrame, k: Int): DataFrame = {
    val est = kmvEstimate(hashes, k)
    val a = est.select(col("slice").as("slice_a"), col("theta").as("ta"))
    val b = est.select(col("slice").as("slice_b"), col("theta").as("tb"))
    val pairs = a.join(b, col("slice_a") < col("slice_b"))
      .withColumn("theta_ab", least(col("ta"), col("tb")))
    val ha = hashes.select(col("slice").as("slice_a"), col("h"))
    val hb = hashes.select(col("slice").as("slice_b"), col("h"))
    val common = ha.join(hb, Seq("h"))
      .select(col("slice_a"), col("slice_b"), col("h"))
    val counts = common.join(broadcast(pairs), Seq("slice_a", "slice_b"))
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("exact_inter"),
        sum(when(col("theta_ab").isNull || col("h") < col("theta_ab"), 1L)
          .otherwise(0L)).as("c_below"))
    pairs.join(counts, Seq("slice_a", "slice_b"), "left_outer")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("c_below", coalesce(col("c_below"), lit(0L)))
      .withColumn("est_inter",
        when(col("theta_ab").isNull, col("c_below")).otherwise(
          expr(s"CAST((CAST(c_below AS DECIMAL(38,0)) * " +
            s"CAST($HashRange AS DECIMAL(38,0))) div " +
            "CAST(theta_ab AS DECIMAL(38,0)) AS BIGINT)")))
      .withColumn("err_permille",
        expr("abs(est_inter - exact_inter) * 1000 div " +
          "greatest(exact_inter, 1L)"))
      .select(col("slice_a"), col("slice_b"), col("theta_ab"),
        col("c_below"), col("est_inter"), col("exact_inter"),
        col("err_permille"))
  }
}
