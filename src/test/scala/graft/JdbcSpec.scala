package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.JobRunner
import graft.etl.JobRunner.IoConfig

/** S1/S2 jdbc branches exercised for real against embedded Derby (the
  * reference's persistence layer is Postgres via libpqxx — same JDBC
  * plan shape, different dialect): write creates the table, read scans
  * it, and an equality filter is pushed down into the JDBC scan rather
  * than evaluated in Spark. */
class JdbcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("jdbc-spec", "4").getOrCreate()

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc round-trip: write creates table, read returns the rows") {
    import spark.implicits._
    val jobs = Seq(
      ("j1", "COMPLETED", 100L),
      ("j2", "RUNNING", 5L),
      ("j3", "COMPLETED", 7L)).toDF("jobId", "status", "recordsProcessed")
    // Derby's default StringType mapping is CLOB, which cannot be
    // compared server-side — declare VARCHAR so predicates can push down
    JobRunner.write(jobs, IoConfig("jdbc", "", Map(
      "url" -> url, "dbtable" -> "jobs",
      "createTableColumnTypes" -> "jobId VARCHAR(64), status VARCHAR(32)")))
    val back = JobRunner.read(spark, IoConfig("jdbc", "",
      Map("url" -> url, "dbtable" -> "jobs")))
    assert(back.count() == 3)
    assert(back.filter(col("status") === "RUNNING")
      .select("jobId").head.getString(0) == "j2")
  }

  test("jdbc read pushes equality filters into the scan") {
    val back = JobRunner.read(spark, IoConfig("jdbc", "",
      Map("url" -> url, "dbtable" -> "jobs")))
    val filtered = back.filter(col("status") === "COMPLETED")
    assert(filtered.count() == 2)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.toLowerCase.contains("equalto(status,completed)"),
      s"status equality not pushed into the JDBC scan:\n$plan")
  }
}
