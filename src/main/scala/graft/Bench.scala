package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query executes via the `noop` sink — unlike `count()`, which lets
  * Catalyst prune projections and skip computing column expressions, noop
  * forces full evaluation of every output column, so the timing reflects
  * the real operator cost. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", graft.core.GraftSession.DefaultCpus)
    val spark: SparkSession = graft.core.GraftSession.builder("graft-bench", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm pass at the TARGET sf: run every query once untimed so the
    // timed pass measures steady-state operator cost — not per-query
    // Janino compilation, interpreted-lambda classgen, first-use
    // classloading, or one-time fixture materialization (all costs that
    // vanish on a long-lived cluster).
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.sharedState.cacheManager.clearCache()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      // deterministic cache release between queries (the dedup pipelines
      // persist their per-doc signature tables); outside the timed window
      spark.sharedState.cacheManager.clearCache()
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
