package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StringFns
import graft.operators.LogQuery

/** Spec-only coverage for string functions DuckDB can't oracle
  * (URL codec, title case, paths) plus the P9' substring-scan floor. */
class StringFnsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("stringfns-spec", "4").getOrCreate()

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head.getString(0)
  }

  test("url encode/decode round-trip (reference: string_utils.hpp:407-411)") {
    assert(one(StringFns.urlEncode(lit("a b&c=d"))) == "a+b%26c%3Dd")
    assert(one(StringFns.urlDecode(lit("a+b%26c%3Dd"))) == "a b&c=d")
    assert(one(StringFns.urlDecode(StringFns.urlEncode(lit("x/y?z 1")))) == "x/y?z 1")
  }

  test("title case") {
    assert(one(StringFns.toTitleCase(lit("hello world foo"))) == "Hello World Foo")
  }

  test("path normalize and join (reference: string_utils.hpp:412-415)") {
    assert(one(StringFns.normalizePath(lit("/a//b///c/"))) == "/a/b/c")
    assert(one(StringFns.normalizePath(lit("/"))) == "/")
    assert(one(StringFns.joinPaths(lit("/a/b/"), lit("/c/d"))) == "/a/b/c/d")
    assert(one(StringFns.joinPaths(lit("a"), lit("b"))) == "a/b")
  }

  test("replace first/last edge: needle not present, needle == haystack") {
    import spark.implicits._
    val df = Seq(("abc", "zz", "Y"), ("abc", "abc", "Y")).toDF("s", "f", "r")
    val out = df.select(
      StringFns.replaceFirst(col("s"), col("f"), col("r")).as("rf"),
      StringFns.replaceLast(col("s"), col("f"), col("r")).as("rl")).collect()
    assert(out(0).getString(0) == "abc" && out(0).getString(1) == "abc") // absent
    assert(out(1).getString(0) == "Y" && out(1).getString(1) == "Y")    // whole
  }

  test("json validity + extraction") {
    import spark.implicits._
    val df = Seq("""{"k": "v", "n": "2"}""", """{broken""").toDF("j")
    val out = df.select(
      StringFns.isValidJsonObject(col("j")).as("ok"),
      StringFns.extractJsonField(col("j"), "k").as("k")).collect()
    assert(out(0).getBoolean(0) && out(0).getString(1) == "v")
    assert(!out(1).getBoolean(0) && out(1).isNullAt(1))
  }

  test("P9' substring-scan conformance floor caps at maxResults") {
    import spark.implicits._
    val lines = (1 to 100).map(i => s"line $i contains needle").toDF("value")
    assert(LogQuery.substringScan(lines, "needle", 10).count() == 10)
    assert(LogQuery.substringScan(lines, "absent", 10).count() == 0)
  }
}
