package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** Operational accounting CLI for the LSH quadratic guardrail: for a
  * given corpus, report which band buckets each near-dup configuration
  * would drop at its `maxBucketSize` cap, with populations — the report
  * a 100 TB dedup run logs next to its output so dropped candidate mass
  * is visible, runnable standalone over any sf dir.
  *
  * Usage: HotBucketAudit <sfDir> [cap=100]
  */
object HotBucketAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 100
    val spark = graft.core.GraftSession.get("hot-bucket-audit")
    val d = Tables(spark, dir).documents.select(col("doc_id"), col("text"))
    val dup = d.unionByName(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))

    // q28's word-3-gram 12x3 setting and q41's char-5-gram 8x4 setting
    val word = Dedup.minhashed(dup, "doc_id", "text",
      shingleSize = 3, numHashes = 12, rowsPerBand = 3)
    val char5 = dup.select(col("doc_id").as("id"),
      graft.functions.ShingleExpressions.charShinglesDistinct(col("text"), 5).as("shingles"))
      .withColumn("signature",
        graft.functions.HashExpressions.minhashSignature(col("shingles"), 8))
      .withColumn("band_keys",
        graft.functions.TextFunctions.lshBandKeys(col("signature"), 4))

    for ((label, mh) <- Seq("word3x12x3" -> word, "char5x8x4" -> char5)) {
      val hot = Dedup.hotBuckets(mh, cap)
        .agg(count(lit(1)).as("n_buckets"), sum(col("n_docs")).as("docs_in_hot"),
          max(col("n_docs")).as("biggest"))
        .collect()(0)
      println(s"[hot-bucket-audit] $label cap=$cap dropped_buckets=${hot.getLong(0)} " +
        s"member_rows=${Option(hot.get(1)).getOrElse(0L)} biggest=${Option(hot.get(2)).getOrElse(0L)}")
    }
    spark.stop()
  }
}
