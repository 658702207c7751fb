package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LogFileSource

/** S7 source semantics the q48 oracle can't see: multi-file provenance
  * (filename + per-file line numbers), context extraction, malformed
  * lines surfaced rather than dropped. */
class LogFileSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("logfile-spec", "4").getOrCreate()

  test("multi-file read: filename + per-file 1-based line numbers") {
    val dir = Files.createTempDirectory("graft-logsrc")
    Files.writeString(dir.resolve("app1.log"),
      "[2025-01-01 10:00:00.000] [INFO ] [db] started | job_id=j1 thread=t9\n" +
        "[2025-01-01 10:00:01.500] [ERROR] [db] boom\n" +
        "this line is garbage\n")
    Files.writeString(dir.resolve("app2.log"),
      "[2025-01-01 11:00:00.250] [WARN ] [api] slow request\n")
    val got = LogFileSource.read(spark, dir.toString)
      .orderBy(col("filename"), col("lineNumber")).collect()

    assert(got.length == 4)
    val r1 = got(0)
    assert(r1.getAs[String]("filename") == "app1.log")
    assert(r1.getAs[Long]("lineNumber") == 1L)
    assert(r1.getAs[String]("level") == "INFO") // padding stripped
    assert(r1.getAs[String]("component") == "db")
    assert(r1.getAs[String]("jobId") == "j1")
    assert(r1.getAs[String]("threadId") == "t9")
    assert(r1.getAs[java.sql.Timestamp]("timestamp") ==
      java.sql.Timestamp.valueOf("2025-01-01 10:00:00"))

    val r2 = got(1)
    assert(r2.getAs[Long]("lineNumber") == 2L)
    assert(r2.getAs[String]("level") == "ERROR")
    assert(r2.getAs[java.sql.Timestamp]("timestamp").getTime % 1000 == 500)

    val garbage = got(2)
    assert(garbage.getAs[Long]("lineNumber") == 3L)
    assert(garbage.getAs[String]("level") == null)    // malformed: no level
    assert(garbage.getAs[String]("message") == "this line is garbage")

    val r4 = got(3)
    assert(r4.getAs[String]("filename") == "app2.log")
    assert(r4.getAs[Long]("lineNumber") == 1L) // per-file numbering restarts
    assert(r4.getAs[String]("level") == "WARN")
    assert(r4.getAs[String]("jobId") == null) // no context suffix
  }

  test("line numbers stay exact when one file spans multiple splits") {
    val dir = Files.createTempDirectory("graft-splitsafe")
    val n = 5000
    val sb = new StringBuilder
    (1 to n).foreach { i =>
      sb.append(f"[2025-03-01 00:00:${i % 60}%02d.000] [INFO ] [gen] line payload number $i%d\n")
    }
    Files.writeString(dir.resolve("big.log"), sb.toString)
    // minSplits=16 forces FileInputFormat to cut the single file into
    // many byte-range splits — the exact condition that scrambled the
    // old window-over-monotonic-id numbering.
    val raw = LogFileSource.readRaw(spark, dir.toString, minSplits = 16)
    assert(raw.rdd.getNumPartitions > 4, "fixture must actually span splits")
    val got = raw.orderBy(col("lineNumber"))
      .select("lineNumber", "value").collect()
    assert(got.length == n)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1L)
      assert(r.getString(1).endsWith(s"number ${i + 1}"))
    }
  }

  test("formatLine -> parse round-trips typed rows") {
    import spark.implicits._
    val rows = Seq(
      ("2025-02-01 09:30:15.123", "INFO", "etl", "processed 42 records"),
      ("2025-02-01 09:30:16.000", "FATAL", "etl", "oom"))
      .toDF("ts_s", "level", "component", "message")
      .withColumn("timestamp", col("ts_s").cast("timestamp")).drop("ts_s")
    val dir = Files.createTempDirectory("graft-roundtrip").toString
    LogFileSource.formatLine(rows).coalesce(1).write.mode("overwrite").text(dir)
    val back = LogFileSource.read(spark, dir)
      .orderBy(col("lineNumber"))
      .select("level", "component", "message").collect()
    assert(back.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("INFO", "etl", "processed 42 records"), ("FATAL", "etl", "oom")))
  }
}
