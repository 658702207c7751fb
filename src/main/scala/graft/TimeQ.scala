package graft

/** Dev utility: time a comma-separated list of registered queries against
  * a sf dir — one warm pass then `SPARK_GRAFT_TIMEQ_PASSES` (default 3)
  * timed passes each, cache cleared between passes like Bench. Keeps
  * plan-iteration loops fast: `runMain graft.TimeQ q75_neardup_components
  * /root/testdata/sf0.1`. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: TimeQ <q1,q2,...> [sfDir]")
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = sys.env.getOrElse("SPARK_GRAFT_TIMEQ_PASSES", "3").toInt
    val spark = graft.core.GraftSession.get("graft-timeq")
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n; have: ${SparkEntry.queries.keys.toSeq.sorted.take(10)}..."))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        t
      }
      val warm = once()
      val timed = (1 to passes).map(_ => once())
      println(f"[timeq] $n%-28s warm=$warm%.2f timed=${timed.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
