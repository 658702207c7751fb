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
  * Scale shape: one distinct-aggregation over (slice, item) plus the
  * [[kmvSketch]] rank window are the only corpus-sized steps; every
  * pairwise estimate ([[kmvIntersectionsSketchOnly]], [[kmvUnions]])
  * joins the resulting k-row sketches. At 100 TB the sketches are a
  * few KB per slice and the pairwise stage is slice-count², not
  * corpus-anything. [[kmvIntersections]] additionally computes the
  * EXACT intersection from the full hash sets — the opt-in error
  * harness (q175), not the production path. */
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
    // ONE mergeable aggregation (round 19): θ = the k-th smallest hash
    // = the max of the min-k bounded heap ([[graft.functions.TopKAgg]]
    // under score = −h; hashes are distinct within a slice, so the id
    // tiebreak never decides). The previous row_number window sorted
    // each slice's FULL distinct hash set in one task — the
    // low-cardinality-partition window the TopKAgg scaladoc exists to
    // replace — and needed a second shuffle to join θ back onto the
    // counts. Values are bit-identical: same k-th smallest, same count.
    hashes.groupBy(col("slice"))
      .agg(count(lit(1)).as("n_distinct"),
        graft.functions.TopKAgg.topK(-col("h"), col("h"), k).as("_tk"))
      .withColumn("theta",
        when(size(col("_tk")) === k,
          element_at(col("_tk"), k).getField("id")))
      .drop("_tk")
      .withColumn("est_distinct",
        when(col("theta").isNull, col("n_distinct")).otherwise(
          expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * " +
            s"CAST($HashRange AS DECIMAL(38,0))) div " +
            "CAST(theta AS DECIMAL(38,0)) AS BIGINT)")))
      .select(col("slice"), col("n_distinct"), col("theta"),
        col("est_distinct"))
  }

  /** Per-slice k-row KMV sketch: each slice's k smallest hashes, rank
    * attached (the rank-k hash IS θ; a slice with fewer than k distinct
    * hashes keeps all of them — the exact regime, θ undefined). The
    * min-k pass over the distinct hash set is the ONLY corpus-sized
    * step in the sketch family: everything downstream of this frame
    * touches at most k rows per slice. Round 19: the rank window
    * (which sorted each slice's FULL hash set in a single task —
    * slices are low-cardinality, so that task was the whole corpus
    * pass) became a mergeable bounded-heap aggregation
    * ([[graft.functions.TopKAgg]] under score = −h) — map-side
    * combinable, k rows per slice across the exchange, identical
    * (h, rk) rows out. */
  def kmvSketch(hashes: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    hashes.groupBy(col("slice"))
      .agg(graft.functions.TopKAgg.topK(-col("h"), col("h"), k).as("_tk"))
      .select(col("slice"), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col("slice"), col("_e.id").as("h"),
        (col("_pos") + 1).cast("int").as("rk"))
  }

  /** Sketch-only pairwise intersection estimates — the production path:
    * both join inputs are the k-row per-slice sketches from
    * [[kmvSketch]], so the pairwise stage shuffles sketch-sized state at
    * ANY corpus size (slice-count² pairs × ≤ k rows — the scale shape
    * the module doc promises, now callable). The estimate is
    * bit-identical to [[kmvIntersections]]'s: a common hash strictly
    * below θ∩ = min(θ_a, θ_b) is below both θs and hence inside both
    * k-row sketches (the hashes below a slice's θ are exactly its
    * ranks 1..k−1; an exact-regime slice's sketch is its full set), so
    * c_below computed from sketches equals c_below from the full hash
    * sets. Deliberately NO exact_inter / err_permille columns —
    * computing those requires the corpus-sized join this path exists to
    * avoid; [[kmvIntersections]] (q175) stays as the opt-in error
    * harness. */
  def kmvIntersectionsSketchOnly(sketch: DataFrame, k: Int): DataFrame = {
    val summ = sketch.groupBy(col("slice"))
      .agg(max(when(col("rk") === k, col("h"))).as("theta"))
    val pairs = summ.select(col("slice").as("slice_a"), col("theta").as("ta"))
      .join(summ.select(col("slice").as("slice_b"), col("theta").as("tb")),
        col("slice_a") < col("slice_b"))
      .withColumn("theta_ab", least(col("ta"), col("tb")))
    val sa = sketch.select(col("slice").as("slice_a"), col("h"))
    val sb = sketch.select(col("slice").as("slice_b"), col("h"))
    val counts = sa.join(sb, Seq("h"))
      .join(broadcast(pairs), Seq("slice_a", "slice_b"))
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(sum(when(col("theta_ab").isNull || col("h") < col("theta_ab"), 1L)
        .otherwise(0L)).as("c_below"))
    pairs.join(counts, Seq("slice_a", "slice_b"), "left_outer")
      .withColumn("c_below", coalesce(col("c_below"), lit(0L)))
      .withColumn("est_inter",
        when(col("theta_ab").isNull, col("c_below")).otherwise(
          expr(s"CAST((CAST(c_below AS DECIMAL(38,0)) * " +
            s"CAST($HashRange AS DECIMAL(38,0))) div " +
            "CAST(theta_ab AS DECIMAL(38,0)) AS BIGINT)")))
      .select(col("slice_a"), col("slice_b"), col("theta_ab"),
        col("c_below"), col("est_inter"))
  }

  /** Pairwise union estimates from MERGED k-row sketches — the KMV
    * mergeability law made executable: the k smallest hashes of A ∪ B
    * are each among A's k smallest or B's k smallest, so re-ranking
    * sketch_a ∪ sketch_b and taking the k-th smallest yields EXACTLY
    * the θ a fresh sketch built over the union data would have. The
    * union-of-sketches estimate is therefore bit-identical to the
    * sketch-of-union estimate — q179's oracle computes the latter from
    * the full hash sets, and hash equality IS the mergeability proof
    * (the q117 mergeable-HLL contract, theta edition). Exact regime:
    * θ∪ undefined ⟺ the merged sketch has < k distinct hashes ⟺ the
    * union itself does (both slices were complete), so the merged count
    * is the exact union cardinality. Everything here is sketch-sized:
    * ≤ 2k rows per pair. */
  def kmvUnions(sketch: DataFrame, k: Int): DataFrame = {
    val slices = sketch.select(col("slice")).distinct()
    val pairs = slices.select(col("slice").as("slice_a"))
      .join(slices.select(col("slice").as("slice_b")),
        col("slice_a") < col("slice_b"))
    val merged = broadcast(pairs)
      .join(sketch, col("slice") === col("slice_a") ||
        col("slice") === col("slice_b"))
      .select(col("slice_a"), col("slice_b"), col("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("slice_a"), col("slice_b")).orderBy(col("h").asc)
    val ranked = merged.withColumn("urk", row_number().over(w))
    val thetaU = ranked.filter(col("urk") === k)
      .select(col("slice_a"), col("slice_b"), col("h").as("theta_u"))
    merged.groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("n_merged"))
      .join(thetaU, Seq("slice_a", "slice_b"), "left_outer")
      .withColumn("est_union",
        when(col("theta_u").isNull, col("n_merged")).otherwise(
          expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * " +
            s"CAST($HashRange AS DECIMAL(38,0))) div " +
            "CAST(theta_u AS DECIMAL(38,0)) AS BIGINT)")))
      .select(col("slice_a"), col("slice_b"), col("theta_u"),
        col("est_union"))
  }

  /** Pairwise slice-intersection estimates (slice_a < slice_b):
    * θ∩ = min(θ_a, θ_b), c = common hashes strictly below θ∩,
    * est = c·2^60 div θ∩ — alongside the exact intersection and the
    * permille error vs it. Slices in the exact regime (θ null)
    * intersect exactly (their full hash sets are below any θ).
    *
    * NOTE: this is the ERROR HARNESS, not the production path — the
    * exact_inter column requires joining the FULL per-slice hash sets
    * (corpus-sized on both sides). Production pairwise estimation is
    * [[kmvIntersectionsSketchOnly]] over [[kmvSketch]] frames, which
    * produces the identical theta_ab/c_below/est_inter values from
    * k rows per slice. */
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
