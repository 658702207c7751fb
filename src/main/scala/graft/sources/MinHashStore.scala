package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted minhashed-corpus store — the store side of incremental
  * NEAR-dup admission (`Dedup.incrementalNearDupPairs` /
  * `streamingNearDupMatches`), as [[FingerprintStore]] is to exact
  * dedup. Rows are `Dedup.minhashed` output: (id, shingles, signature,
  * band_keys) — signatures are computed ONCE at admission and reused by
  * every later run, which is the whole point: the store is re-scanned
  * per batch, never re-digested.
  *
  * Layout trade vs FingerprintStore: one flat generation repartitioned
  * by id (no deltas) — band-join plans read the whole store anyway
  * (every batch can collide with any band), so delta-granular reads buy
  * nothing; [[append]] rewrites via union + repartition, which at
  * ingestion-batch cadence is one corpus-of-signatures pass. The write
  * lands in a `gen=<n>` subdirectory and the swap is by generation
  * pointer (read picks the highest complete generation), so a crashed
  * append leaves the previous generation intact and readable — the
  * same never-hold-the-only-copy-deletable rule as FingerprintStore's
  * base swap. */
object MinHashStore {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def generations(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .filter(s => f.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(s => (s.getPath.getName.stripPrefix("gen=").toLong, s.getPath.toString))
      .sortBy(_._1)
  }

  /** Initialize (or reset) the store from a minhashed corpus. A reset
    * writes ABOVE the current generation — read() picks the highest
    * complete one, so writing gen=0 under an appended-to store would
    * leave the reset silently unreachable. Retired generations are
    * dropped after the new one commits. */
  def write(mh: DataFrame, dir: String, numFiles: Int = 32): Unit = {
    val spark = mh.sparkSession
    val prior = generations(spark, dir)
    val next = prior.lastOption.map(_._1 + 1).getOrElse(0L)
    mh.repartition(numFiles, col("id"))
      .write.mode("overwrite").parquet(s"$dir/gen=$next")
    val f = fs(spark, dir)
    prior.foreach { case (_, p) => f.delete(new org.apache.hadoop.fs.Path(p), true) }
  }

  /** The latest complete generation (empty-schema-safe only via an
    * existing store — initialize with [[write]] first). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val gens = generations(spark, dir)
    require(gens.nonEmpty, s"no complete generation under $dir — write() first")
    spark.read.parquet(gens.last._2)
  }

  /** Append newly-admitted minhashed rows as generation n+1 =
    * current ∪ new (re-partitioned by id), then drop generations older
    * than n — generation n ITSELF is retired lazily (deleted by the
    * NEXT append), because a live reader may still hold a lazy plan
    * over it: a streaming query's static store side, or an `admitted`
    * frame the caller acts on after appending. One-generation grace
    * covers one append cycle; readers must re-`read` between cycles.
    * A crash before the new generation's `_SUCCESS` leaves the old one
    * as the visible store. */
  def append(spark: SparkSession, dir: String, newMh: DataFrame,
      numFiles: Int = 32): Unit = {
    val gens = generations(spark, dir)
    require(gens.nonEmpty, s"no complete generation under $dir — write() first")
    val next = gens.last._1 + 1
    read(spark, dir).unionByName(newMh)
      .repartition(numFiles, col("id"))
      .write.mode("overwrite").parquet(s"$dir/gen=$next")
    val f = fs(spark, dir)
    gens.dropRight(1).foreach { case (_, p) =>
      f.delete(new org.apache.hadoop.fs.Path(p), true) }
  }
}
