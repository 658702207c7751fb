package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Codecs

/** The reference's serialization quirks: epoch-0/"NULL" sentinels and
  * parse-failure→now() (SURVEY §1.2, §7.4 risks 1+3). */
class CodecsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("codecs-spec", "4").getOrCreate()

  test("epoch-0 writes as NULL; 'NULL' string reads as null (round-trip)") {
    import spark.implicits._
    val df = Seq(
      ("a", Timestamp.valueOf("2025-09-01 10:00:00")),
      ("b", new Timestamp(0L)),
      ("c", null.asInstanceOf[Timestamp])).toDF("k", "ts")
    val written = df.select(col("k"), Codecs.writeTimestampSentinel(col("ts")).as("s"))
    val rows = written.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows("a").contains("2025-09-01 10:00:00"))
    assert(rows("b").isEmpty) // epoch 0 → NULL
    assert(rows("c").isEmpty)
    val back = written
      .withColumn("s2", when(col("k") === "b", lit("NULL")).otherwise(col("s")))
      .select(col("k"), Codecs.readTimestampSentinel(col("s2")).as("ts"))
      .collect().map(r => r.getString(0) -> Option(r.getTimestamp(1))).toMap
    assert(back("a").contains(Timestamp.valueOf("2025-09-01 10:00:00")))
    assert(back("b").isEmpty) // literal "NULL" string → null
    assert(back("c").isEmpty)
  }

  test("ISO parse failure falls back to injected now()") {
    import spark.implicits._
    val now = lit("2025-09-09 09:09:09").cast("timestamp")
    val df = Seq("2025-09-01T10:00:00", "2025-09-01T10:00:00.123Z", "garbage", "")
      .toDF("s")
    val got = df.select(Codecs.parseIsoOrNow(col("s"), now).as("ts"))
      .collect().map(_.getTimestamp(0).toString)
    assert(got(0).startsWith("2025-09-01 10:00:00"))
    assert(got(1).startsWith("2025-09-01 10:00:00.123"))
    assert(got(2).startsWith("2025-09-09 09:09:09")) // failure → now
    assert(got(3).startsWith("2025-09-09 09:09:09"))
  }

  test("health surface returns one live row") {
    import spark.implicits._
    val jobs = Seq(
      graft.model.EtlJob("j1", "EXTRACT", "RUNNING", "s", "t",
        Timestamp.valueOf("2025-09-01 10:00:00"))).toDF()
    val h = graft.api.QueryApi.health(spark, Some(jobs)).collect()
    assert(h.length == 1)
    val r = h.head
    assert(r.getBoolean(r.fieldIndex("status")))
    assert(r.getLong(r.fieldIndex("active_jobs")) == 1L)
    assert(r.getBoolean(r.fieldIndex("spark_alive")))
  }
}
