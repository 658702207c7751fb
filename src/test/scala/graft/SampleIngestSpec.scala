package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrioritySample
import graft.streaming.SampleIngest

case class SampleRow(grp: String, id: Long, w: Long)

/** Streaming weighted-sample maintenance: per-micro-batch folds equal
  * the batch sampler over everything ingested (the mergeability law),
  * replays are idempotent, and the state survives a crash between the
  * publish renames. */
class SampleIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("sample-ingest-spec", "4").getOrCreate()

  private val K = 4

  private def rows(lo: Long, hi: Long): Seq[SampleRow] =
    (lo until hi).map(i => SampleRow(s"g${i % 3}", i, 10L + (i * 7) % 90))

  private def collectSample(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getLong(6)))
      .sortBy { case (g, rk, _, _, _, _, _) => (g, rk) }.toSeq

  test("stream of micro-batches == batch sampler over the union") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sample-ingest").toString
    val stream = MemoryStream[SampleRow]
    val sink = SampleIngest.sampleSink(dir, K)
    val query = stream.toDS().writeStream
      .foreachBatch((b: org.apache.spark.sql.Dataset[SampleRow],
          id: Long) => sink(b.toDF(), id))
      .outputMode("append").start()
    try {
      // four micro-batches, forced separately
      Seq((0L, 30L), (30L, 55L), (55L, 80L), (80L, 120L)).foreach {
        case (lo, hi) =>
          stream.addData(rows(lo, hi))
          query.processAllAvailable()
          // mid-stream invariant: served == batch sampler over the
          // prefix ingested so far
          val want = PrioritySample.sample(
            rows(0L, hi).toDF("grp", "id", "w"), K)
          assert(collectSample(SampleIngest.serve(spark, dir, K)) ==
            collectSample(want), s"diverged after batch ending $hi")
      }
    } finally query.stop()
  }

  test("replayed batch is a no-op (idempotent fold)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sample-replay").toString
    val b1 = rows(0L, 40L).toDF("grp", "id", "w")
    val b2 = rows(40L, 70L).toDF("grp", "id", "w")
    SampleIngest.ingest(b1, dir, K)
    SampleIngest.ingest(b2, dir, K)
    val before = collectSample(SampleIngest.serve(spark, dir, K))
    SampleIngest.ingest(b2, dir, K) // retry of an already-applied batch
    assert(collectSample(SampleIngest.serve(spark, dir, K)) == before)
  }

  test("crash between publish renames: state.old keeps serving") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-sample-crash").toString
    SampleIngest.ingest(rows(0L, 50L).toDF("grp", "id", "w"), dir, K)
    val before = collectSample(SampleIngest.serve(spark, dir, K))
    val f = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash after `state` was retired but before tmp landed
    assert(f.rename(new Path(s"$dir/state"), new Path(s"$dir/state.old")))
    assert(collectSample(SampleIngest.serve(spark, dir, K)) == before)
    // and the next fold heals the store
    SampleIngest.ingest(rows(50L, 60L).toDF("grp", "id", "w"), dir, K)
    assert(f.exists(new Path(s"$dir/state")))
    val want = PrioritySample.sample(
      rows(0L, 60L).toDF("grp", "id", "w"), K)
    assert(collectSample(SampleIngest.serve(spark, dir, K)) ==
      collectSample(want))
  }
}
