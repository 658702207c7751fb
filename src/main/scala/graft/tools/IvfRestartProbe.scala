package graft.tools

import org.apache.spark.sql.functions._

/** Measurement harness for the IVF min-SSE restart option: builds the
  * index at restarts 1..N on the given sf's embeddings and prints
  * small-nprobe recall@10 vs the exact baseline plus the winning
  * restart's SSE — the evidence behind IvfSpec's recall floor (the
  * round-14 advice: either restarts recover the pre-k-means++ 0.74
  * lottery or the measurement that they don't pay gets documented).
  *
  * Usage: IvfRestartProbe <sfDir> [maxRestarts=3] [nlist=8] [nprobe=2]
  */
object IvfRestartProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxRestarts = if (args.length > 1) args(1).toInt else 3
    val nlist = if (args.length > 2) args(2).toInt else 8
    val nprobe = if (args.length > 3) args(3).toInt else 2
    implicit val spark: org.apache.spark.sql.SparkSession =
      graft.core.GraftSession.get("ivf-restart-probe")
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.core.Tables(spark, dir).embeddings
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = corpus.filter(col("vec_id") < 5)
    val brute = graft.operators.Similarity
      .bruteForceTopK(queries, corpus, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (r <- 1 to maxRestarts) {
      val index = graft.operators.IvfAnn.build(corpus, nlist, restarts = r)
      val got = graft.operators.IvfAnn
        .topK(queries, index, k = 10, nprobe = nprobe)
        .select("query_id", "neighbor_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val recall = got.intersect(brute).size.toDouble / brute.size
      val sse = corpus.agg(sum(
        graft.functions.VectorExpressions.minSqDist(
          col("embedding"),
          index.centroids.orderBy(col("list_id"))
            .collect().map(_.getSeq[Double](1).toArray).toSeq)
          .cast("decimal(38,6)"))).head().getDecimal(0)
      println(f"[ivf-restart] restarts=$r recall@10(nprobe=$nprobe/$nlist)=" +
        f"$recall%.3f sse=$sse")
    }
    corpus.unpersist(false)
    spark.stop()
  }
}
