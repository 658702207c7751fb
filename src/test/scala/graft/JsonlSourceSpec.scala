package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonlSource

/** JSONL ingestion: permissive parse splits good rows from quarantined
  * raw lines, nothing is silently dropped, accounting is exact. */
class JsonlSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("jsonl-spec", "4").getOrCreate()

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("good rows parse, corrupt lines quarantine verbatim, stats exact") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val file = dir.resolve("corpus.jsonl")
    Files.write(file, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "first document"}""",
      """{"doc_id": 2, "text": "second document"}""",
      """{"doc_id": 3 "text": "missing comma breaks this"}""",
      """not json at all""",
      """{"doc_id": 4, "text": "fourth document"}"""))
    val (good, quarantined) = JsonlSource.read(spark, file.toString, schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 4L))
    // raw lines preserved byte-for-byte for reproducibility
    val bad = quarantined.collect().map(_.getString(0)).toSet
    assert(bad == Set(
      """{"doc_id": 3 "text": "missing comma breaks this"}""",
      """not json at all"""))
    val stats = JsonlSource.ingestStats(good, quarantined).head()
    assert(stats.getLong(0) == 3L && stats.getLong(1) == 2L)
    assert(stats.getLong(2) == 400L) // 2/5 = 400 permille
  }

  test("fully clean input: empty quarantine, zero permille") {
    val dir = Files.createTempDirectory("graft-jsonl-clean")
    val file = dir.resolve("clean.jsonl")
    Files.write(file, java.util.Arrays.asList(
      """{"doc_id": 10, "text": "a"}""",
      """{"doc_id": 11, "text": "b"}"""))
    val (good, quarantined) = JsonlSource.read(spark, file.toString, schema)
    assert(good.count() == 2 && quarantined.count() == 0)
    assert(JsonlSource.ingestStats(good, quarantined).head().getLong(2) == 0L)
  }

  test("csv: malformed rows quarantine, well-formed rows parse") {
    val dir = Files.createTempDirectory("graft-csv")
    val file = dir.resolve("corpus.csv")
    Files.write(file, java.util.Arrays.asList(
      "1,first document",
      "not_a_number,second document", // doc_id fails to convert
      "3,third document"))
    val (good, quarantined) =
      graft.sources.CsvSource.read(spark, file.toString, schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val bad = quarantined.collect().map(_.getString(0)).toSeq
    assert(bad == Seq("not_a_number,second document"))
  }
}
