package graft

import graft.etl.JobRunner
import graft.etl.JobRunner.{IoConfig, JobSpec}
import graft.model.TransformationRule

/** Library usage sample: run a FULL_ETL job end-to-end and print its
  * lifecycle — the public-API surface of graft.etl.JobRunner. */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("etl-demo")
    val out = java.nio.file.Files.createTempDirectory("etl-demo").toString

    val ok = JobRunner.run(spark, JobSpec("demo_job", "FULL_ETL",
      IoConfig("parquet", "/root/testdata/sf0.001/documents.parquet"),
      IoConfig("parquet", s"$out/result"),
      rules = Seq(
        TransformationRule("lang", "lang_upper", "uppercase"),
        TransformationRule("n_chars", "n_chars_x2", "multiply",
          Map("factor" -> "2")))))
    println(s"DEMO_STATUS=${ok.job.status} records=${ok.job.recordsProcessed} " +
      s"progress=${ok.progressLog.map(_._1).mkString(",")} " +
      s"rate=${ok.job.processingRate}")

    val bad = JobRunner.run(spark, JobSpec("demo_fail_job", "LOAD",
      IoConfig("parquet", "/root/testdata/sf0.001/region.parquet"),
      IoConfig("parquet", s"$out/never")))
    println(s"DEMO_FAIL_STATUS=${bad.job.status} error=${bad.job.errorMessage}")

    val conc = JobRunner.runConcurrent(spark, (1 to 4).map(i =>
      JobSpec(s"conc_$i", "FULL_ETL",
        IoConfig("parquet", "/root/testdata/sf0.001/region.parquet"),
        IoConfig("parquet", s"$out/conc$i"))), maxConcurrent = 3)
    println(s"DEMO_CONCURRENT statuses=${conc.map(_.job.status).mkString(",")}")

    val readBack = spark.read.parquet(s"$out/result")
    println(s"DEMO_READBACK rows=${readBack.count()} " +
      s"cols=${readBack.columns.sorted.mkString(",")}")
    spark.stop()
  }
}
