package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.JobRunner
import graft.etl.JobRunner.{IoConfig, JobSpec}
import graft.model.{JobStatus, TransformationRule}

/** ETL orchestration lifecycle: status transitions, progress checkpoints,
  * observe()-based metrics, fault injection
  * (reference: src/etl_job_manager.cpp:540-654). */
class EtlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("etl-spec", "4").getOrCreate()

  private val srcDir = "/root/testdata/sf0.001"

  test("FULL_ETL completes with checkpoints 0/10/50/80/100 and metrics") {
    val out = Files.createTempDirectory("etl-out").toString
    val spec = JobSpec("job_ok", "FULL_ETL",
      IoConfig("parquet", s"$srcDir/documents.parquet"),
      IoConfig("parquet", s"$out/result"),
      rules = Seq(
        TransformationRule("lang", "lang_upper", "uppercase"),
        TransformationRule("source", "source", "trim")))
    val r = JobRunner.run(spark, spec)
    assert(r.job.status == JobStatus.Completed)
    assert(r.progressLog.map(_._1) == Seq(0, 10, 50, 80, 100))
    assert(r.job.recordsProcessed == 500)
    assert(r.job.recordsSuccessful == 500)
    assert(r.job.startedAt.isDefined && r.job.completedAt.isDefined)
    // output is readable and transformed
    val written = spark.read.parquet(s"$out/result")
    assert(written.count() == 500)
    assert(written.columns.contains("lang_upper"))
  }

  test("fault injection: jobId containing 'fail' -> FAILED with message") {
    val out = Files.createTempDirectory("etl-out2").toString
    val spec = JobSpec("job_fail_1", "LOAD",
      IoConfig("parquet", s"$srcDir/region.parquet"),
      IoConfig("parquet", s"$out/never"))
    val r = JobRunner.run(spark, spec)
    assert(r.job.status == JobStatus.Failed)
    assert(r.job.errorMessage.contains("Simulated constraint violation"))
    assert(r.progressLog.map(_._1) == Seq(0, 10, 50)) // stopped before load
    assert(!new java.io.File(s"$out/never").exists())
  }

  test("unknown source format fails the job, not the process") {
    val r = JobRunner.run(spark, JobSpec("job_badfmt", "EXTRACT",
      IoConfig("avro", "/nope"), IoConfig("parquet", "/nope2")))
    assert(r.job.status == JobStatus.Failed)
    assert(r.job.errorMessage.exists(_.contains("unknown source format")))
  }

  test("simulated extract source shape (100 records, 95% success)") {
    val df = JobRunner.simulatedExtract(spark)
    assert(df.count() == 100)
    assert(df.filter(org.apache.spark.sql.functions.col("success")).count() == 95)
  }

  test("concurrent execution: cap respected, failures isolated") {
    val out = Files.createTempDirectory("etl-conc").toString
    val specs = (1 to 6).map { i =>
      val id = if (i == 3) s"job_fail_$i" else s"job_$i"
      JobSpec(id, "FULL_ETL",
        IoConfig("parquet", s"$srcDir/region.parquet"),
        IoConfig("parquet", s"$out/r$i"))
    }
    val results = JobRunner.runConcurrent(spark, specs, maxConcurrent = 5)
    assert(results.length == 6)
    val byId = results.map(r => r.job.jobId -> r.job).toMap
    assert(byId("job_fail_3").status == JobStatus.Failed)
    (Seq(1, 2, 4, 5, 6)).foreach(i =>
      assert(byId(s"job_$i").status == JobStatus.Completed, s"job_$i"))
  }

  test("control-plane upsert replaces the job row") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val t0 = new java.sql.Timestamp(0)
    val existing = Seq(
      graft.model.EtlJob("a", "EXTRACT", "PENDING", "s", "t", t0),
      graft.model.EtlJob("b", "LOAD", "RUNNING", "s", "t", t0)).toDF()
    val updated = JobRunner.upsertJob(existing,
      graft.model.EtlJob("a", "EXTRACT", "COMPLETED", "s", "t", t0))
    assert(updated.count() == 2)
    assert(updated.filter($"jobId" === "a").select("status").head.getString(0)
      == "COMPLETED")
  }

  test("bucketed upsert rewrites only the target bucket directory") {
    implicit val s: SparkSession = spark
    val t0 = new java.sql.Timestamp(0)
    val wh = java.nio.file.Files.createTempDirectory("graft-jobs-wh")
      .resolve("jobs").toString
    def job(id: String, status: String) =
      graft.model.EtlJob(id, "EXTRACT", status, "s", "t", t0)
    // seed three jobs (each lands in its hashCode-derived bucket)
    JobRunner.upsertJobBucketed(wh, job("alpha", "PENDING"))
    JobRunner.upsertJobBucketed(wh, job("beta", "PENDING"))
    JobRunner.upsertJobBucketed(wh, job("gamma", "RUNNING"))
    assert(JobRunner.jobBucket("alpha", 64) != JobRunner.jobBucket("beta", 64))

    def bucketFiles(id: String) = {
      val dir = new java.io.File(wh, s"bucket=${JobRunner.jobBucket(id, 64)}")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toSeq.sortBy(_._1)
    }
    val betaBefore = bucketFiles("beta")

    // update alpha: its bucket is rewritten, beta's files are untouched
    JobRunner.upsertJobBucketed(wh, job("alpha", "COMPLETED"))
    assert(bucketFiles("beta") == betaBefore)

    val all = JobRunner.readJobsBucketed(wh)
    assert(all.count() == 3) // alpha replaced, not duplicated
    assert(JobRunner.lookupJobBucketed(wh, "alpha")
      .select("status").head.getString(0) == "COMPLETED")
    // the point-lookup plan prunes to the single bucket partition
    val plan = JobRunner.lookupJobBucketed(wh, "alpha")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bucket"), plan)
  }

  test("orc sink/source round-trip through the job pipeline") {
    val out = Files.createTempDirectory("etl-orc").toString
    val spec = JobSpec("job_orc", "FULL_ETL",
      IoConfig("parquet", s"$srcDir/region.parquet"),
      IoConfig("orc", s"$out/result"),
      rules = Seq(TransformationRule("r_name", "r_name", "trim")))
    assert(JobRunner.run(spark, spec).job.status == JobStatus.Completed)
    // read back through the same source dispatch
    val back = JobRunner.read(spark,
      graft.etl.JobRunner.IoConfig("orc", s"$out/result"))
    assert(back.count() == 5)
    assert(back.columns.contains("r_name"))
  }
}
