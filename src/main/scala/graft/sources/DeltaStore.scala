package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The base+delta parquet store protocol shared by [[FingerprintStore]]
  * (its original home — see that object's scaladoc for the full
  * crash-safety narrative) and [[PostingsStore]], parameterized by row
  * schema, whether compaction dedupes, and the hash-layout columns.
  *
  * Layout: `dir/base/` (last compacted generation) +
  * `dir/delta/<batchId>/` (one per append since). Readers union base
  * (falling back to `base.old` mid-crash) with every COMMITTED delta —
  * `_SUCCESS` present, or visible data files (the
  * marksuccessfuljobs=false fallback). That fallback means a
  * marker-less delta with SOME data files serves as committed: for a
  * membership store (FingerprintStore) a partial delta only
  * under-suppresses, but for a store whose rows are fractions of a
  * document (postings) it would serve a SUBSET of a doc's term rows —
  * wrong df/scores until the batch replays. Stores with that exposure
  * pass `strictCommit = true`: only `_SUCCESS`-marked deltas serve (or
  * compact), so a v2-committer crash mid-append leaves the delta
  * invisible until its deterministic batch id overwrites it. Strict
  * mode requires the writer config to keep marker files on (the
  * default); with marksuccessfuljobs=false a strict store would serve
  * base only. Compaction is single-writer and
  * never holds the only copy in a deletable state: write `base.tmp`,
  * rename base→base.old, rename tmp→base, delete base.old + exactly
  * the delta FILES snapshotted up front (late-landing files of an
  * in-flight delta survive as its remainder). The compaction
  * repartition keeps each output file a disjoint hash range of
  * `layoutCols`, so the store's join side stays uniformly spread at
  * 100 TB.
  */
private[sources] final class DeltaStore(
    schema: StructType,
    dedupe: Boolean,
    layoutCols: Seq[String],
    strictCommit: Boolean = false) {

  private val colNames = schema.fieldNames.toSeq

  private def selectCols(df: DataFrame): DataFrame =
    df.select(colNames.map(col): _*)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append one run's rows as a delta. `batchId` must be the caller's
    * deterministic run identifier so reruns overwrite their own delta
    * instead of duplicating it. */
  def appendDelta(rows: DataFrame, dir: String, batchId: String): Unit = {
    val out = selectCols(rows)
    (if (dedupe) out.distinct() else out)
      .write.mode("overwrite").parquet(s"$dir/delta/$batchId")
  }

  private def dataFiles(f: FileSystem, p: Path): Seq[Path] =
    f.listStatus(p).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath)

  private def committedDeltas(f: FileSystem, dir: String): Seq[Path] = {
    val deltaDir = new Path(s"$dir/delta")
    if (!f.exists(deltaDir)) Nil
    else f.listStatus(deltaDir).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        f.exists(new Path(p, "_SUCCESS")) ||
          (!strictCommit && dataFiles(f, p).nonEmpty)
      }
  }

  /** Name of the fold-point marker inside a base generation: the
    * lexicographically greatest batch id compaction has folded in.
    * Underscore-prefixed, so both Spark's parquet reader and the
    * strict-commit data-file listing ignore it. */
  private val FoldMarker = "_folded_max"

  private def readFoldPoint(f: FileSystem, baseDir: Path): Option[String] = {
    val p = new Path(baseDir, FoldMarker)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](256)
        val n = in.read(bytes)
        Some(new String(bytes, 0, math.max(n, 0), "UTF-8").trim)
      } finally in.close()
    }
  }

  private def writeFoldPoint(f: FileSystem, baseDir: Path,
      batchId: String): Unit = {
    val out = f.create(new Path(baseDir, FoldMarker), true)
    try out.write(batchId.getBytes("UTF-8")) finally out.close()
  }

  /** The store AS OF `upToBatch`: base ∪ committed deltas whose batch
    * id is lexicographically ≤ `upToBatch` — time travel at delta
    * granularity (callers must use ordered batch ids: zero-padded or
    * fixed-prefix, as the ingestion protocols here already do).
    * Compaction collapses history: it records its fold point (the
    * greatest batch id folded into base) and an as-of read BEFORE
    * that point fails loudly rather than silently serving the folded
    * base — the snapshot simply no longer exists. As-of reads at or
    * after the fold point remain exact. */
  def loadAsOf(spark: SparkSession, dir: String,
      upToBatch: String): DataFrame = {
    val f = fs(spark, dir)
    val baseDir =
      if (f.exists(new Path(s"$dir/base"))) Some(new Path(s"$dir/base"))
      else if (f.exists(new Path(s"$dir/base.old")))
        Some(new Path(s"$dir/base.old"))
      else None
    baseDir.flatMap(readFoldPoint(f, _)).foreach { fold =>
      require(fold <= upToBatch,
        s"as-of $upToBatch predates the compaction fold point $fold: " +
          "that snapshot was collapsed into the base generation")
    }
    val parts = baseDir.map(_.toString).toSeq ++
      committedDeltas(f, dir).filter(_.getName <= upToBatch).map(_.toString)
    if (parts.isEmpty) empty(spark)
    else parts.map(p => selectCols(spark.read.parquet(p)))
      .reduce(_ unionByName _)
  }

  /** Base generation (or its mid-crash `base.old` predecessor) ∪ all
    * committed deltas, minus the caller's own excluded delta (the
    * replay-safety hook — see FingerprintStore.load). */
  def load(spark: SparkSession, dir: String,
      excludeDelta: Option[String]): DataFrame = {
    val f = fs(spark, dir)
    val base =
      if (f.exists(new Path(s"$dir/base"))) Seq(s"$dir/base")
      else if (f.exists(new Path(s"$dir/base.old"))) Seq(s"$dir/base.old")
      else Nil
    val parts = base ++ committedDeltas(f, dir)
      .filterNot(p => excludeDelta.contains(p.getName)).map(_.toString)
    if (parts.isEmpty) empty(spark)
    else parts.map(p => selectCols(spark.read.parquet(p)))
      .reduce(_ unionByName _)
  }

  /** Fold base + committed deltas into a fresh base generation of
    * `numFiles` hash-disjoint files, then drop what was folded.
    * Returns the number of deltas folded. Protocol as documented on
    * the class. */
  def compact(spark: SparkSession, dir: String, numFiles: Int): Int = {
    val f = fs(spark, dir)
    val folded = committedDeltas(f, dir)
    val foldedFiles: Seq[(Path, Seq[Path])] =
      folded.map(p => p -> dataFiles(f, p))
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
    val parts = baseSide.map(p => selectCols(spark.read.parquet(p))) ++
      (if (deltaFileStrs.nonEmpty)
        Seq(selectCols(spark.read.parquet(deltaFileStrs: _*))) else Nil)
    val unioned =
      if (parts.isEmpty) empty(spark)
      else parts.reduce(_ unionByName _)
    (if (dedupe) unioned.distinct() else unioned)
      .repartition(numFiles, layoutCols.map(col): _*)
      .write.mode("overwrite").parquet(tmp.toString)
    // fold-point marker: the greatest batch id this base subsumes —
    // carried forward from the previous generation, advanced by what
    // this compaction folds. Written INSIDE tmp so the base rename
    // publishes data and marker atomically.
    val prevFold = baseSide.headOption
      .flatMap(p => readFoldPoint(f, new Path(p)))
    val newFold = (prevFold.toSeq ++ folded.map(_.getName)) match {
      case Nil => None
      case ids => Some(ids.max)
    }
    newFold.foreach(writeFoldPoint(f, tmp, _))
    if (f.exists(base) && !f.rename(base, old))
      sys.error(s"compaction retire failed: $base -> $old")
    if (!f.rename(tmp, base))
      sys.error(s"compaction rename failed: $tmp -> $base")
    if (f.exists(old)) f.delete(old, true)
    foldedFiles.foreach { case (deltaDir, files) =>
      files.foreach(p => f.delete(p, false))
      if (dataFiles(f, deltaDir).isEmpty) f.delete(deltaDir, true)
    }
    folded.size
  }

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
