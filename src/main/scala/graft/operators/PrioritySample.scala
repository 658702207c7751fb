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

  /** The sampler's complete state: (grp, rank, id, w, pr) — the
    * top-(k+1) priority rows per group (ranks 1..k+1; fewer when the
    * group is smaller). This IS the mergeable summary: priorities are
    * pure functions of (id, w), so topState(A ∪ B) ==
    * topState(topState(A) ∪ B) row for row — the streaming
    * maintenance law ([[graft.streaming.SampleIngest]]). */
  def topState(items: DataFrame, k: Int, grpCol: String = "grp",
      idCol: String = "id", wCol: String = "w"): DataFrame = {
    require(k >= 1, s"k must be at least 1, got $k")
    val base = items.select(col(grpCol).as("grp"), col(idCol).as("id"),
      col(wCol).cast("long").as("w"))
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
    * with the group threshold and est_milli columns attached. */
  def estimate(state: DataFrame, k: Int): DataFrame = {
    val tau = state.filter(col("rank") === k + 1)
      .select(col("grp"), col("pr").as("tau"))
    state.filter(col("rank") <= k)
      .join(broadcast(tau), Seq("grp"), "left_outer")
      .withColumn("est_milli",
        when(col("tau").isNull, col("w") * lit(1000L))
          .otherwise(greatest(col("w") * lit(1000L),
            col("tau") * lit(1000L))))
      .select(col("grp"), col("rank"), col("id"), col("w"), col("pr"),
        col("tau"), col("est_milli"))
  }

  /** (grp, rank, id, w, pr, tau, est_milli) — the k sampled items per
    * group in priority order, the group threshold τ (null in the
    * exact regime), and the DLT estimator in milli units:
    * est_milli = max(w, τ)·1000 (τ already in natural units). */
  def sample(items: DataFrame, k: Int, grpCol: String = "grp",
      idCol: String = "id", wCol: String = "w"): DataFrame =
    estimate(topState(items, k, grpCol, idCol, wCol), k)
}
