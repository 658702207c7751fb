package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Candidate-mass accounting for the hot-frame cap (q223): on the
  * video posting fixture WITH the planted universal static frame
  * (hash -1 on every entity — the black-intro-frame skew), measure
  *
  *   - the UNCAPPED candidate count (distinct pairs sharing any
  *     hash — the universal frame alone makes this ≥ C(n,2), the
  *     quadratic blowup the cap exists for),
  *   - the CAPPED candidate count (pairs sharing a cold hash only),
  *   - the hot frames [[Dedup.hotFrameHashes]] reports, and
  *   - verified-pair PARITY: on this fixture the capped and uncapped
  *     forms must emit the SAME verified pairs (one shared universal
  *     frame cannot reach J ≥ 0.5 against ≥ 2 real frames), so the
  *     cap's only effect is the candidate bound — the loss is the
  *     accounted hot row, not a pair.
  *
  * Usage: runMain graft.tools.FrameCapProbe <sfDir> [cap]
  * Prints one JSON line; exit 1 if the cap did not bound the mass to
  * under a tenth of the uncapped form, if no hot frame was reported,
  * or if the verified pair sets diverge. */
object FrameCapProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FrameCapProbe <sfDir> [cap]")
    val sfDir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("frame-cap-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hs = graft.queries.MultimodalQueries.videoFrameHashes(spark, sfDir)
    val univ = hs.select(col("id")).distinct().withColumn("fhash", lit(-1L))
    val p = hs.unionByName(univ).select(col("id"), col("fhash")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEntities = p.select(col("id")).distinct().count()

    def candidates(postings: org.apache.spark.sql.DataFrame): Long =
      postings.select(col("id").as("id_a"), col("fhash"))
        .join(postings.select(col("id").as("id_b"), col("fhash"))
          .hint("shuffle_hash"), Seq("fhash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct().count()

    val t0 = System.nanoTime()
    val hotDf = Dedup.hotFrameHashes(p, cap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = hotDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val cold = p.join(broadcast(hotDf.select(col("fhash"))),
      Seq("fhash"), "left_anti")
    val cappedCand = candidates(cold)
    val tCap = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val uncappedCand = candidates(p)
    val tUncap = (System.nanoTime() - t1) / 1e9

    def pairs(mps: Option[Int]) =
      Dedup.frameSetNearDupPairs(p, tMilli = 500, maxPostingSize = mps)
        .select(col("id_a"), col("id_b"), col("jacc_milli"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val cappedPairs = pairs(Some(cap))
    val uncappedPairs = pairs(None)

    val parity = cappedPairs == uncappedPairs
    println(s"""{"metric":"frame_cap_probe","sf_dir":"$sfDir","cap":$cap,""" +
      s""""n_entities":$nEntities,"hot_frames":${hot.length},""" +
      s""""hot_max_population":${hot.map(_._2).maxOption.getOrElse(0L)},""" +
      s""""capped_candidates":$cappedCand,""" +
      s""""uncapped_candidates":$uncappedCand,""" +
      s""""capped_cand_sec":${f"$tCap%.1f"},""" +
      s""""uncapped_cand_sec":${f"$tUncap%.1f"},""" +
      s""""verified_pairs":${cappedPairs.size},"pair_parity":$parity}""")
    // division, not `cappedCand * 10 > uncappedCand`: the multiplication
    // can overflow Long at extreme candidate counts and invert the check
    if (!parity || hot.isEmpty || cappedCand > uncappedCand / 10) {
      System.err.println("FrameCapProbe: cap failed to bound candidate " +
        s"mass or diverged (parity=$parity, hot=${hot.length}, " +
        s"capped=$cappedCand, uncapped=$uncappedCand)")
      spark.stop() // don't lean on shutdown hooks for session teardown
      sys.exit(1)
    }
    spark.stop()
  }
}
