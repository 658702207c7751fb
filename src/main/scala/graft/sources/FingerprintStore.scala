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
  * crash-safe — a failed append leaves a directory with no `_SUCCESS`
  * marker, which readers SKIP (the filtering is ours, in [[load]];
  * Spark's committer writes the marker but does not filter on read).
  * Compaction is SINGLE WRITER and never holds the only copy in a
  * deletable state: it builds the new generation at `base.tmp`, retires
  * the old one to `base.old`, renames tmp→base, and only then deletes
  * `base.old` and the folded deltas. A crash at ANY step leaves either
  * `base` or `base.old` present, and [[load]] falls back to `base.old`
  * when `base` is missing — so the visible store is always a superset
  * of the truth, which is safe for dedup (we may re-drop a dup, never
  * re-admit one). The fp repartition at compaction keeps each output
  * file a disjoint hash range, so the store's anti-join side stays
  * uniformly spread at 100 TB.
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

  /** Delta directories whose write COMMITTED: the `_SUCCESS` marker
    * exists, OR the directory holds at least one visible data file —
    * the fallback matters because marksuccessfuljobs=false is standard
    * object-store tuning, and gating on the marker alone would silently
    * hide every delta there (re-admitting duplicates with no error).
    * A crashed append leaves only hidden content (`_temporary/`), so it
    * still skips — reading it would throw (no parquet footer to infer
    * a schema from); the rerun's overwrite of the same batchId replaces
    * it. Residual window: a v2-committer crash can leave SOME visible
    * part files, which reads as a partial (subset) delta until the
    * batch reruns — dedup under-suppresses briefly, never corrupts. */
  private def committedDeltas(f: org.apache.hadoop.fs.FileSystem,
                              dir: String): Seq[Path] = {
    val deltaDir = new Path(s"$dir/delta")
    if (!f.exists(deltaDir)) Nil
    else f.listStatus(deltaDir).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        f.exists(new Path(p, "_SUCCESS")) ||
          f.listStatus(p).exists { s =>
            val n = s.getPath.getName
            s.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
      }
  }

  /** The full store: base generation ∪ all committed deltas (distinct
    * not needed for anti-join membership; compaction restores it).
    * Falls back to the retired `base.old` generation when `base` is
    * absent — the state a crash between compaction's two renames
    * leaves behind. */
  def load(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, excludeDelta = None)

  /** [[load]] with one delta left out — the replay-safety hook: a
    * re-run of batch N must gate against everything EXCEPT its own
    * crashed prior write, or it suppresses its own documents and then
    * overwrites its delta with the empty result (permanent fingerprint
    * loss). */
  def load(spark: SparkSession, dir: String,
      excludeDelta: Option[String]): DataFrame = {
    val f = fs(spark, dir)
    val base =
      if (f.exists(new Path(s"$dir/base"))) Seq(s"$dir/base")
      else if (f.exists(new Path(s"$dir/base.old"))) Seq(s"$dir/base.old")
      else Nil
    val parts = base ++ committedDeltas(f, dir)
      .filterNot(p => excludeDelta.contains(p.getName)).map(_.toString)
    if (parts.isEmpty) emptyStore(spark)
    else parts.map(spark.read.parquet(_).select(col("fp"))).reduce(_ unionByName _)
  }

  /** Fold base + committed deltas into a fresh distinct base generation
    * of `numFiles` hash-disjoint files, then drop what was folded.
    * Returns the number of deltas folded.
    *
    * Swap protocol (no step deletes the only copy): write `base.tmp`,
    * rename base→base.old, rename tmp→base, delete base.old + folded
    * delta FILES. Recovery is in two places: [[load]] reads `base.old`
    * when `base` is missing (crash between the renames), and the
    * cleanup below drops a stale `base.old` that survived a crash after
    * the second rename (at that point `base` supersedes it).
    *
    * Deletion is FILE-precise, not directory-precise: the data files of
    * each delta are SNAPSHOTTED up front, exactly that snapshot is read
    * into the new base, and exactly that snapshot is deleted after the
    * swap. A marker-less delta whose append is still IN FLIGHT (visible
    * part files, job not done — possible under
    * marksuccessfuljobs=false or a v2 committer) therefore keeps any
    * files that landed after the snapshot: they stay readable as the
    * delta's remainder instead of being deleted unread, which is what a
    * whole-directory delete would have done. The delta dir itself goes
    * only when nothing data-bearing remains. */
  def compact(spark: SparkSession, dir: String, numFiles: Int = 32): Int = {
    val f = fs(spark, dir)
    val folded = committedDeltas(f, dir)
    val foldedFiles: Seq[(Path, Seq[Path])] = folded.map { p =>
      p -> f.listStatus(p).toSeq
        .filter { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith("_") && !n.startsWith(".")
        }.map(_.getPath)
    }
    val tmp = new Path(s"$dir/base.tmp")
    val base = new Path(s"$dir/base")
    val old = new Path(s"$dir/base.old")
    // leftovers from crashed runs: tmp is never read, and old is only
    // meaningful while base is absent
    if (f.exists(tmp)) f.delete(tmp, true)
    if (f.exists(old) && f.exists(base)) f.delete(old, true)
    val baseSide =
      if (f.exists(base)) Seq(base.toString)
      else if (f.exists(old)) Seq(old.toString)
      else Nil
    val deltaFileStrs = foldedFiles.flatMap(_._2).map(_.toString)
    val parts = baseSide.map(p => spark.read.parquet(p).select(col("fp"))) ++
      (if (deltaFileStrs.nonEmpty)
        Seq(spark.read.parquet(deltaFileStrs: _*).select(col("fp"))) else Nil)
    val unioned =
      if (parts.isEmpty) emptyStore(spark)
      else parts.reduce(_ unionByName _)
    unioned.distinct()
      .repartition(numFiles, col("fp"))
      .write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(base) && !f.rename(base, old))
      sys.error(s"compaction retire failed: $base -> $old")
    if (!f.rename(tmp, base))
      sys.error(s"compaction rename failed: $tmp -> $base")
    if (f.exists(old)) f.delete(old, true)
    foldedFiles.foreach { case (deltaDir, files) =>
      files.foreach(p => f.delete(p, false))
      val remainder = f.listStatus(deltaDir).exists { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      if (!remainder) f.delete(deltaDir, true)
    }
    folded.size
  }

  private def emptyStore(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.StringType))))
}
