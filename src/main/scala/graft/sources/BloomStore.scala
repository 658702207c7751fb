package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Persisted benchmark Bloom filter for decontamination gates — the
  * production shape of `CorpusOps.bloomContamination`: the filter is
  * built ONCE when the benchmark suite changes (a few hundred KB for a
  * million grams at fpp=0.03) and every ingestion job — batch backfill
  * or streaming admission — reads the same bytes instead of re-scanning
  * the benchmark corpus. Stored through the Hadoop FileSystem API, so
  * the same path works on local disk, HDFS, or object storage.
  *
  * Atomicity: the write lands at `<path>.tmp` and renames into place —
  * readers never observe a torn filter; a crashed write leaves the old
  * generation readable.
  */
object BloomStore {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def write(spark: SparkSession, bytes: Array[Byte], path: String): Unit = {
    val f = fs(spark, path)
    val tmp = new Path(path + ".tmp")
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    val dst = new Path(path)
    if (f.exists(dst)) f.delete(dst, false)
    if (!f.rename(tmp, dst))
      sys.error(s"BloomStore: rename $tmp -> $dst failed")
  }

  /** Committed filter files under `dir` (no .tmp), sorted by name. */
  def list(spark: SparkSession, dir: String): Seq[String] =
    list(spark, dir, ".bloom")

  /** Committed files under `dir` with the given suffix — `.bloom` for
    * filters, `.bloom.n` for their item-count sidecars (a `.bloom.n`
    * file never matches the `.bloom` listing and vice versa). */
  def list(spark: SparkSession, dir: String, suffix: String): Seq[String] = {
    val f = fs(spark, dir)
    val d = new Path(dir)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
      .map(_.getPath.toString).sorted
  }

  def read(spark: SparkSession, path: String): Array[Byte] = {
    val f = fs(spark, path)
    val in = f.open(new Path(path))
    try {
      val len = f.getFileStatus(new Path(path)).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0L, buf)
      buf
    } finally in.close()
  }
}
