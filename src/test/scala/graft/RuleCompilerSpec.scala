package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FormatDouble15
import graft.model.TransformationRule
import graft.rules.RuleCompiler

/** Edge-case parity with the reference's DataTransformer
  * (reference: src/data_transformer.cpp; cases from FIXTURES.md §2 and
  * scripts/test_is_float_fix.cpp). */
class RuleCompilerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("rule-spec", "4").getOrCreate()

  private def oneRow(fields: (String, String)*): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      fields.map(f => org.apache.spark.sql.types.StructField(f._1, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(fields.map(_._2): _*)).asJava, schema)
  }

  test("format_double15: trailing zeros stripped, 15 sig digits") {
    assert(FormatDouble15.format(199.0) == "199")
    assert(FormatDouble15.format(19.9 * 10) == "199") // 198.99999999999997 rounds
    assert(FormatDouble15.format(64.5) == "64.5")
    assert(FormatDouble15.format(0.1 + 1) == "1.1")
    assert(FormatDouble15.format(-2.5) == "-2.5")
    assert(FormatDouble15.format(0.0) == "0")
    assert(FormatDouble15.format(1.0 / 3.0) == "0.333333333333333")
  }

  test("multiply: numeric parse failure leaves value unchanged") {
    val df = oneRow("age" -> "not_a_number")
    val out = RuleCompiler(df, Seq(
      TransformationRule("age", "age2", "add", Map("addend" -> "1"))))
    assert(out.head.getString(out.columns.indexOf("age2")) == "not_a_number")
  }

  test("multiply: stod prefix-parse semantics (19.9abc → 19.9)") {
    val df = oneRow("v" -> " 19.9abc")
    val out = RuleCompiler(df, Seq(
      TransformationRule("v", "v10", "multiply", Map("factor" -> "10"))))
    assert(out.head.getString(out.columns.indexOf("v10")) == "199")
  }

  test("multiply without factor parameter is a no-op") {
    val df = oneRow("v" -> "5")
    val out = RuleCompiler(df, Seq(
      TransformationRule("v", "v2", "multiply", Map.empty)))
    assert(out.head.getString(out.columns.indexOf("v2")) == "5")
  }

  test("trim strips space/tab/newline/cr; all-whitespace → empty") {
    val df = oneRow("a" -> "\t hi \n\r", "b" -> " \t\n\r ")
    val out = RuleCompiler(df, Seq(
      TransformationRule("a", "a", "trim"),
      TransformationRule("b", "b", "trim")))
    val r = out.head
    assert(r.getString(out.columns.indexOf("a")) == "hi")
    assert(r.getString(out.columns.indexOf("b")) == "")
  }

  test("unknown transformation type is identity; rules apply in order") {
    val df = oneRow("name" -> "jane")
    val out = RuleCompiler(df, Seq(
      TransformationRule("name", "up", "uppercase"),
      TransformationRule("up", "up2", "rot13"),   // unknown → copies value
      TransformationRule("up2", "low", "lowercase")))
    val r = out.head
    assert(r.getString(out.columns.indexOf("up")) == "JANE")
    assert(r.getString(out.columns.indexOf("up2")) == "JANE")
    assert(r.getString(out.columns.indexOf("low")) == "jane")
  }

  test("missing source field skips the rule") {
    val df = oneRow("x" -> "1")
    val out = RuleCompiler(df, Seq(
      TransformationRule("ghost", "y", "uppercase")))
    assert(!out.columns.contains("y"))
  }

  test("required-field validation splits good/bad") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("age", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row("John", "30"),
      org.apache.spark.sql.Row("", "7"),
      org.apache.spark.sql.Row(null, "9")).asJava, schema)
    val rules = Seq(
      TransformationRule("name", "name", "uppercase", Map("required" -> "true")))
    val (good, bad) = RuleCompiler.transformWithValidation(df, rules)
    assert(good.count() == 1)
    assert(bad.count() == 2)
    val errs = bad.select("_validation_errors").head.getSeq[String](0)
    assert(errs == Seq("Required field 'name' is missing or empty"))
    assert(good.head.getString(0) == "JOHN")
  }
}
