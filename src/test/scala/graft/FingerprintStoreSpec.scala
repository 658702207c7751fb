package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.sources.FingerprintStore

/** Persisted fingerprint-store lifecycle: delta appends accumulate,
  * compaction folds them into one distinct base without changing dedup
  * semantics, and a rerun of the same batch id overwrites (not
  * duplicates) its delta. */
class FingerprintStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("fpstore-spec", "4").getOrCreate()
  import spark.implicits._

  test("append, load, compact: same membership, fewer pieces, deltas folded") {
    val dir = Files.createTempDirectory("graft-fpstore").toString
    val b1 = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val b2 = Seq((3L, "ALPHA  TEXT"), (4L, "gamma text")).toDF("doc_id", "text")

    // run 1 against the empty store: everything survives
    val s0 = FingerprintStore.load(spark, dir)
    assert(s0.count() == 0)
    assert(Dedup.incrementalDedup(b1, s0).count() == 2)
    FingerprintStore.appendDelta(
      b1.select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp")),
      dir, batchId = "b0001")

    // run 2: the whitespace/case twin of doc 1 is suppressed by the store
    val s1 = FingerprintStore.load(spark, dir)
    val run2 = Dedup.incrementalDedup(b2, s1)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(run2.toSeq == Seq(4L))
    FingerprintStore.appendDelta(
      b2.select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp")),
      dir, batchId = "b0002")

    // membership before compaction (alpha counted once per side is fine)
    val before = FingerprintStore.load(spark, dir)
      .distinct().collect().map(_.getString(0)).toSet
    assert(before.size == 3) // alpha, beta, gamma

    // compact: 2 deltas folded, base only, identical membership
    assert(FingerprintStore.compact(spark, dir, numFiles = 2) == 2)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$dir/base")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/base.tmp")))
    val deltaPath = new org.apache.hadoop.fs.Path(s"$dir/delta")
    assert(!f.exists(deltaPath) ||
      f.listStatus(deltaPath).forall(!_.isDirectory))
    val after = FingerprintStore.load(spark, dir)
    assert(after.collect().map(_.getString(0)).toSet == before)
    assert(after.count() == 3) // base alone is already distinct

    // post-compaction dedup behaves identically: repeats still suppressed
    val b3 = Seq((9L, "beta text"), (10L, "delta text")).toDF("doc_id", "text")
    val run3 = Dedup.incrementalDedup(b3, FingerprintStore.load(spark, dir))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(run3.toSeq == Seq(10L))

    // a rerun of batch b0002 overwrites its delta — membership unchanged
    FingerprintStore.appendDelta(
      b2.select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp")),
      dir, batchId = "b0002")
    FingerprintStore.appendDelta(
      b2.select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp")),
      dir, batchId = "b0002")
    assert(FingerprintStore.load(spark, dir).distinct().count() == 3)
  }

  test("compaction survives a leftover tmp dir from a crashed run") {
    val dir = Files.createTempDirectory("graft-fpstore-crash").toString
    val b1 = Seq((1L, "one doc")).toDF("doc_id", "text")
    FingerprintStore.appendDelta(
      b1.select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp")),
      dir, batchId = "b0001")
    // simulate a crash that left a stale base.tmp behind
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/base.tmp/garbage"))
    assert(FingerprintStore.compact(spark, dir) == 1)
    assert(FingerprintStore.load(spark, dir).count() == 1)
  }

  test("crash between compaction renames: base.old keeps the store readable") {
    val dir = Files.createTempDirectory("graft-fpstore-swap").toString
    def fpsOf(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp"))
    FingerprintStore.appendDelta(fpsOf(Seq((1L, "one doc"))), dir, "b0001")
    assert(FingerprintStore.compact(spark, dir) == 1) // base now exists
    FingerprintStore.appendDelta(fpsOf(Seq((2L, "two doc"))), dir, "b0002")
    val before = FingerprintStore.load(spark, dir)
      .collect().map(_.getString(0)).toSet
    assert(before.size == 2)
    // simulate the crash window: base retired to base.old, new base not
    // yet renamed in — the exact state after compact()'s first rename
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.rename(new org.apache.hadoop.fs.Path(s"$dir/base"),
      new org.apache.hadoop.fs.Path(s"$dir/base.old")))
    // load() falls back to base.old: nothing forgotten
    assert(FingerprintStore.load(spark, dir)
      .collect().map(_.getString(0)).toSet == before)
    // the next compaction recovers: folds base.old ∪ deltas, leaves a
    // clean base, drops the retired generation
    assert(FingerprintStore.compact(spark, dir) == 1)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$dir/base")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$dir/base.old")))
    assert(FingerprintStore.load(spark, dir)
      .collect().map(_.getString(0)).toSet == before)
  }

  test("compaction of an in-flight delta deletes only what it folded") {
    val dir = Files.createTempDirectory("graft-fpstore-inflight").toString
    def fpsOf(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp"))
    FingerprintStore.appendDelta(fpsOf(Seq((1L, "one doc"))), dir, "b0001")
    // simulate a marker-less in-flight delta: one part file visible NOW,
    // a second landing AFTER compact snapshots the directory — model the
    // "after" state by adding the late file post-compaction and checking
    // it is still readable (a whole-dir delete would have eaten it)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fpsOf(Seq((2L, "two doc"))).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/delta/b0002.tmp")
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/delta/b0002.tmp/_SUCCESS"), false)
    f.rename(new org.apache.hadoop.fs.Path(s"$dir/delta/b0002.tmp"),
      new org.apache.hadoop.fs.Path(s"$dir/delta/b0002"))
    assert(FingerprintStore.compact(spark, dir) == 2) // both data-bearing
    // the late-arriving file of the in-flight append
    fpsOf(Seq((3L, "three doc"))).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/delta/b0003.tmp")
    val late = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/delta/b0003.tmp"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/delta/b0002"))
    f.rename(late, new org.apache.hadoop.fs.Path(s"$dir/delta/b0002/late.parquet"))
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/delta/b0003.tmp"), true)
    // all three fingerprints visible: base (1, 2) ∪ the remainder (3)
    assert(FingerprintStore.load(spark, dir).distinct().count() == 3)
    // and the next compaction folds the remainder file too
    assert(FingerprintStore.compact(spark, dir) == 1)
    assert(FingerprintStore.load(spark, dir).distinct().count() == 3)
  }

  test("uncommitted delta (no _SUCCESS) is skipped, not fatal, not folded") {
    val dir = Files.createTempDirectory("graft-fpstore-partial").toString
    val b1 = Seq((1L, "one doc")).toDF("doc_id", "text")
    FingerprintStore.appendDelta(
      b1.select(graft.functions.TextFunctions.contentFingerprint(col("text")).as("fp")),
      dir, batchId = "b0001")
    // simulate a crashed append: a delta dir with no committed files
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/delta/b0002/_temporary"))
    assert(FingerprintStore.load(spark, dir).count() == 1) // no throw
    assert(FingerprintStore.compact(spark, dir) == 1) // only b0001 folded
    // the partial dir is left for its batch's rerun to overwrite
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$dir/delta/b0002")))
    assert(FingerprintStore.load(spark, dir).count() == 1)
  }

  test("strictCommit: a marker-less postings delta is invisible until its batch replays") {
    // PostingsStore rows are FRACTIONS of a document — a partial delta
    // would serve a subset of a doc's term rows (wrong df and scores),
    // so unlike the membership store it gates on _SUCCESS alone.
    import graft.sources.PostingsStore
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-poststore-strict").toString
    val batch = Seq((1L, "a", 1L, 2L), (1L, "b", 1L, 2L))
      .toDF("doc_id", "term", "tf", "dl")
    PostingsStore.appendDelta(batch, dir, batchId = "b0001")
    assert(PostingsStore.load(spark, dir).count() == 2)
    // simulate a v2-committer crash mid-append: data files visible, no
    // marker — the exact state the membership store's fallback serves
    val f = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.delete(new Path(s"$dir/delta/b0001/_SUCCESS"), false))
    assert(PostingsStore.load(spark, dir).count() == 0,
      "a partial postings delta served term rows")
    // compaction refuses to fold it into base, and leaves it in place
    assert(PostingsStore.compact(spark, dir) == 0)
    assert(f.exists(new Path(s"$dir/delta/b0001")))
    // the deterministic batch id replays over its own debris -> serves
    PostingsStore.appendDelta(batch, dir, batchId = "b0001")
    assert(PostingsStore.load(spark, dir).count() == 2)
  }

  test("loadAsOf: delta-granular time travel; compaction fold point enforced") {
    import graft.sources.PostingsStore
    val dir = Files.createTempDirectory("graft-poststore-asof").toString
    def batch(docId: Long) = Seq((docId, s"t$docId", 1L, 1L))
      .toDF("doc_id", "term", "tf", "dl")
    Seq(1L, 2L, 3L).foreach(i =>
      PostingsStore.appendDelta(batch(i), dir, batchId = s"b000$i"))
    def docsAsOf(b: String) = PostingsStore.loadAsOf(spark, dir, b)
      .select("doc_id").as[Long].collect().toSet

    // prefix snapshots are exact; as-of latest == the full load
    assert(docsAsOf("b0001") == Set(1L))
    assert(docsAsOf("b0002") == Set(1L, 2L))
    assert(docsAsOf("b0003") ==
      PostingsStore.load(spark, dir).select("doc_id").as[Long].collect().toSet)

    // compaction folds b0001..b0003 -> fold point b0003: earlier
    // snapshots no longer exist and reads of them FAIL, not lie
    assert(PostingsStore.compact(spark, dir) == 3)
    assert(docsAsOf("b0003") == Set(1L, 2L, 3L))
    val e = intercept[IllegalArgumentException](docsAsOf("b0002"))
    assert(e.getMessage.contains("fold point"))

    // post-compaction appends are addressable again; the fold point
    // survives a second compaction with nothing new to fold
    PostingsStore.appendDelta(batch(4L), dir, batchId = "b0004")
    assert(docsAsOf("b0003") == Set(1L, 2L, 3L))
    assert(docsAsOf("b0004") == Set(1L, 2L, 3L, 4L))
    assert(PostingsStore.compact(spark, dir) == 1)
    assert(docsAsOf("b0004") == Set(1L, 2L, 3L, 4L))
    assert(intercept[IllegalArgumentException](docsAsOf("b0003"))
      .getMessage.contains("fold point"))
  }
}
