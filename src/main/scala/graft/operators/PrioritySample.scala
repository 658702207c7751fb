package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Priority sampling (Duffield–Lund–Thorup 2007) — the weighted
  * fixed-size sample with an unbiased subset-sum estimator, the
  * sampling scheme a training-data pipeline wants for "keep k docs
  * per source, proportional to weight, and still report calibrated
  * token totals from the sample alone".
  *
  * Per item: a deterministic uniform u ∈ (0, 1] from the repo's h60
  * convention — first 15 hex chars of md5("ps:" ++ id) as a 60-bit
  * integer, quantized to 40 bits (u40 = h60 div 2^20 + 1 ∈ [1, 2^40],
  * u = u40/2^40) — and the priority q = w/u computed exactly as
  * pr = w·2^40 div u40 (the 2^40 factors cancel, so pr IS the
  * natural-units priority, floored; all int64, safe for w < 2^22 —
  * weights here are per-doc sizes). Per group, the k
  * highest-priority items are the sample and τ = the (k+1)-th
  * priority is the threshold; the estimator est = max(w, τ)
  * satisfies E[Σ_sample est] = Σ_group w (the DLT theorem — variance
  * optimal among threshold schemes, exact when a group has ≤ k items:
  * τ undefined and every weight reports exactly).
  *
  * Scale shape: the per-group top-(k+1) rides [[graft.functions.TopKAgg]]
  * — O(k) heaps combined map-side, k+1 rows per group on the exchange,
  * NO per-group sort of the corpus (the window-ranker shape this
  * replaces). The sampled ids then broadcast back onto the items for
  * their weights: one narrow broadcast join, group-count × k rows on
  * the build side. Everything downstream of the scan is integer. */
object PrioritySample {

  /** 2^40 — the priority fixed-point scale. */
  private val P40 = 1099511627776L

  /** Exclusive weight ceiling: pr = w·2^40 div u40 must stay exact in
    * int64 even at the u40 = 1 extreme (pr ≤ w·2^40), so w < 2^22.
    * Weights here are per-doc sizes; a larger unit belongs rescaled by
    * the caller, not silently wrapped here. */
  val MaxWeight: Long = 1L << 22

  /** The sampler's complete state: (grp, rank, id, w, pr) — the
    * top-(k+1) priority rows per group (ranks 1..k+1; fewer when the
    * group is smaller). This IS the mergeable summary: priorities are
    * pure functions of (id, w), so topState(A ∪ B) ==
    * topState(topState(A) ∪ B) row for row — the streaming
    * maintenance law ([[graft.streaming.SampleIngest]]). */
  def topState(items: DataFrame, k: Int, grpCol: String = "grp",
      idCol: String = "id", wCol: String = "w"): DataFrame = {
    require(k >= 1, s"k must be at least 1, got $k")
    // loud per-row guard, in-plan (no extra driver action): a weight at
    // or above 2^22 would silently wrap pr = w·2^40 in int64, corrupting
    // selection AND the estimator — the DuckDB oracle errors on the same
    // input, so wrapping here would be a cross-engine divergence
    val base = items.select(col(grpCol).as("grp"), col(idCol).as("id"),
      when(col(wCol).cast("long").between(0L, MaxWeight - 1),
        col(wCol).cast("long"))
        .otherwise(raise_error(concat(
          lit("PrioritySample: weight "), col(wCol).cast("string"),
          lit(s" outside [0, 2^22) — priority w*2^40 would overflow int64"))))
        .as("w"))
    val prioritized = base
      .withColumn("h60",
        conv(substring(md5(concat(lit("ps:"), col("id").cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long"))
      .withColumn("pr",
        expr(s"(w * ${P40}L) div (h60 div 1048576 + 1)"))
    // top-(k+1) priorities per group: O(k) state, no group sort
    val ranked = prioritized.groupBy(col("grp"))
      .agg(graft.functions.TopKAgg.topK(col("pr"), col("id"), k + 1).as("tk"))
      .select(col("grp"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("grp"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("id"), col("e.score").as("pr"))
    // weights back onto the surviving ids: summary-sized build side,
    // broadcast into the (corpus-sized) items — one narrow pass
    base.join(broadcast(ranked), Seq("grp", "id"))
      .select(col("grp"), col("rank"), col("id"), col("w"), col("pr"))
  }

  /** τ/estimator finalization over a [[topState]] frame: ranks ≤ k
    * with the group threshold and est columns attached. The estimator
    * is plain integer max(w, τ) — no milli scaling: τ can reach w·2^40
    * (a u40 = 1 draw), so a ·1000 would wrap int64 exactly in the
    * regime the threshold scheme is built for. */
  def estimate(state: DataFrame, k: Int): DataFrame = {
    val tau = state.filter(col("rank") === k + 1)
      .select(col("grp"), col("pr").as("tau"))
    state.filter(col("rank") <= k)
      .join(broadcast(tau), Seq("grp"), "left_outer")
      .withColumn("est",
        when(col("tau").isNull, col("w"))
          .otherwise(greatest(col("w"), col("tau"))))
      .select(col("grp"), col("rank"), col("id"), col("w"), col("pr"),
        col("tau"), col("est"))
  }

  /** (grp, rank, id, w, pr, tau, est) — the k sampled items per
    * group in priority order, the group threshold τ (null in the
    * exact regime), and the DLT estimator est = max(w, τ)
    * (τ already in natural units; E[Σ_sample est] = Σ_group w). */
  def sample(items: DataFrame, k: Int, grpCol: String = "grp",
      idCol: String = "id", wCol: String = "w"): DataFrame =
    estimate(topState(items, k, grpCol, idCol, wCol), k)
}
