package graft.tools

/** Scale witness for the component queries DuckDB cannot oracle at
  * sf1.0 (its recursive reachability CTE is interpreter-bound at 55k
  * planted-dup docs): q123's contract IS "incremental == from-scratch
  * full closure", and q75 computes exactly that closure — so a
  * row-for-row equality between the two registered queries, run
  * entirely in Spark, verifies the invariant at any scale factor the
  * DuckDB gate cannot reach. Exits nonzero on any divergence.
  *
  * Usage: ComponentWitness <sfDir>
  */
object ComponentWitness {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.core.GraftSession.get("component-witness")
    spark.sparkContext.setLogLevel("WARN")
    val scratch = graft.SparkEntry.queries("q75_neardup_components")(spark, dir)
    val incremental =
      graft.SparkEntry.queries("q123_incremental_components")(spark, dir)
    // q75 covers the full corpus; q123 solves incrementally over the
    // store/batch split of the SAME corpus — equal outputs on the shared
    // columns is the invariant (both emit canonical_id, n_docs, max_id
    // for clusters with n_docs > 1)
    val a = scratch.collect().map(_.toSeq).toSet
    val b = incremental.collect().map(_.toSeq).toSet
    val missing = a -- b
    val extra = b -- a
    println(s"[component-witness] sf=$dir from_scratch=${a.size} " +
      s"incremental=${b.size} missing=${missing.size} extra=${extra.size}")
    if (missing.nonEmpty || extra.nonEmpty) {
      missing.take(5).foreach(r => println(s"[component-witness] MISSING $r"))
      extra.take(5).foreach(r => println(s"[component-witness] EXTRA $r"))
      spark.stop()
      sys.exit(1)
    }
    println("[component-witness] PASS: incremental == from-scratch closure")
    spark.stop()
  }
}
