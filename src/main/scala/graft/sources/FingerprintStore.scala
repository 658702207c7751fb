package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted fingerprint store for run-over-run incremental dedup
  * (q74's production shape; see `Dedup.incrementalDedup`): each ingestion
  * run anti-joins its batch against the store and appends the batch's
  * fingerprints as a DELTA; a periodic COMPACTION folds base + deltas
  * into one distinct, fp-repartitioned base generation so the store
  * never degrades into thousands of tiny delta files.
  *
  * Layout: `store/base/` (the last compacted generation) +
  * `store/delta/<batchId>/` (one per run since). Readers union whatever
  * exists; dedup semantics only need set membership, so duplicates
  * BETWEEN base and deltas are harmless between compactions.
  *
  * Scale/durability contract (plain parquet — same trade as
  * `JobRunner.upsertJobBucketed`): deltas are append-only and
  * crash-safe (a failed append leaves at most a partial directory the
  * reader skips via _SUCCESS filtering in Spark's committer). Compaction
  * is SINGLE WRITER: it builds the new base at `base.tmp`, atomically
  * renames over `base`, and only then deletes the folded deltas — a
  * crash in between leaves base ∪ deltas a superset of the truth, which
  * is safe for dedup (we may re-drop a dup, never re-admit one). The
  * fp repartition at compaction keeps each output file a disjoint hash
  * range, so the store's anti-join side stays uniformly spread at 100 TB.
  */
object FingerprintStore {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append one run's fingerprints as a delta. `batchId` is the caller's
    * deterministic run identifier (ingestion date, batch seq — NOT a
    * wall-clock read here, so reruns overwrite their own delta instead
    * of duplicating it). */
  def appendDelta(newFps: DataFrame, dir: String, batchId: String): Unit =
    newFps.select(col("fp")).distinct()
      .write.mode("overwrite").parquet(s"$dir/delta/$batchId")

  /** The full store: base generation ∪ all deltas (distinct not needed
    * for anti-join membership; compaction restores it). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val f = fs(spark, dir)
    val parts =
      (if (f.exists(new Path(s"$dir/base"))) Seq(s"$dir/base") else Nil) ++
        (if (f.exists(new Path(s"$dir/delta")))
          f.listStatus(new Path(s"$dir/delta")).toSeq
            .filter(_.isDirectory).map(_.getPath.toString)
         else Nil)
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fp",
            org.apache.spark.sql.types.StringType))))
    else parts.map(spark.read.parquet(_).select(col("fp"))).reduce(_ unionByName _)
  }

  /** Fold base + deltas into a fresh distinct base generation of
    * `numFiles` hash-disjoint files, then drop the folded deltas.
    * Returns the number of deltas folded. */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 32): Int = {
    val f = fs(spark, dir)
    val deltaDir = new Path(s"$dir/delta")
    val folded: Seq[Path] =
      if (f.exists(deltaDir))
        f.listStatus(deltaDir).toSeq.filter(_.isDirectory).map(_.getPath)
      else Nil
    val tmp = new Path(s"$dir/base.tmp")
    if (f.exists(tmp)) f.delete(tmp, true) // leftover from a crashed run
    load(spark, dir).distinct()
      .repartition(numFiles, col("fp"))
      .write.mode("overwrite").parquet(tmp.toString)
    val base = new Path(s"$dir/base")
    if (f.exists(base)) f.delete(base, true)
    if (!f.rename(tmp, base))
      sys.error(s"compaction rename failed: $tmp -> $base")
    folded.foreach(p => f.delete(p, true))
    folded.size
  }
}
