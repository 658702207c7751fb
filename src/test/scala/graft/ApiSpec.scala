package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.QueryApi
import graft.model.EtlJob

/** Param-compiler surface (§2.11): raw query strings → validated plans →
  * results, with the reference's rejection rules. */
class ApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("api-spec", "4").getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  private def jobs = {
    import spark.implicits._
    Seq(
      EtlJob("j1", "EXTRACT", "RUNNING", "s", "t", ts("2025-09-01 10:00:00"),
        Some(ts("2025-09-01 10:00:01"))),
      EtlJob("j2", "LOAD", "COMPLETED", "s", "t", ts("2025-09-02 10:00:00"),
        Some(ts("2025-09-02 10:00:01")), Some(ts("2025-09-02 10:30:01")))).toDF()
  }

  test("query string parses and compiles to a filtered result") {
    val r = QueryApi.monitorJobs(jobs, "status=COMPLETED&limit=10")
    assert(r.isRight)
    val rows = r.toOption.get.collect()
    assert(rows.length == 1 && rows.head.getString(0).contains("\"jobId\":\"j2\""))
  }

  test("invalid params are rejected with the reference's rules") {
    assert(QueryApi.monitorJobs(jobs, "status=BOGUS").isLeft)
    assert(QueryApi.monitorJobs(jobs, "limit=0").isLeft)
    assert(QueryApi.monitorJobs(jobs, "limit=9999").isLeft)
    assert(QueryApi.monitorJobs(jobs, "limit=abc").isLeft)
    assert(QueryApi.monitorJobs(jobs,
      "from=2025-09-03T00:00:00&to=2025-09-01T00:00:00").isLeft) // from > to
    assert(QueryApi.monitorJobs(jobs, "from=not-a-date").isLeft)
    // shape-valid but out-of-range components must be rejected, not
    // silently normalized to a later date
    assert(QueryApi.monitorJobs(jobs, "from=2025-13-40T25:61:61").isLeft)
    assert(QueryApi.monitorJobs(jobs, "from=2025-02-30T00:00:00").isLeft)
  }

  test("query-string values are percent-decoded") {
    val p = QueryApi.parseQueryString("q=a%20b%26c&x%3Dy=1&bad=%zz&tag=c%2B%2B&lit=a+b")
    assert(p("q") == "a b&c")
    assert(p("x=y") == "1")
    assert(p("bad") == "%zz")   // malformed escape left as-is
    assert(p("tag") == "c++")   // %2B decodes to plus
    assert(p("lit") == "a+b")   // literal '+' survives (not form-encoding)
  }

  test("time-range params filter on createdAt") {
    val r = QueryApi.monitorJobs(jobs,
      "from=2025-09-01T00:00:00&to=2025-09-01T23:59:59")
    assert(r.toOption.get.count() == 1)
  }

  test("HTTP wire: real GETs against the bound REST surface") {
    import spark.implicits._
    val logs = Seq(
      graft.model.LogMessage("j1", "ERROR", "db", "boom", ts("2025-09-01 10:00:00")),
      graft.model.LogMessage("j1", "INFO", "db", "fine", ts("2025-09-01 10:00:01"))).toDF()
    val server = graft.api.HttpApi.start(0, spark, jobs, logs)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    def get(path: String): (Int, String) = {
      val conn = new java.net.URL(base + path).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        val code = conn.getResponseCode
        val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = if (in == null) ""
          else try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        (code, body)
      } finally conn.disconnect()
    }
    try {
      val (c1, b1) = get("/api/monitor/jobs?status=COMPLETED&limit=10")
      assert(c1 == 200 && b1.startsWith("[{") && b1.contains("\"jobId\":\"j2\"")
        && !b1.contains("\"j1\""), s"$c1 $b1")
      // the validator's rejection comes back as a 400 JSON error envelope
      val (c2, b2) = get("/api/monitor/jobs?limit=0")
      assert(c2 == 400 && b2.contains("\"error\""), s"$c2 $b2")
      val (c3, b3) = get("/api/logs/search?minLevel=WARN&q=boo")
      assert(c3 == 200 && b3.contains("boom") && !b3.contains("fine"), s"$c3 $b3")
      val (c4, b4) = get("/api/logs/search?sortBy=bogus")
      assert(c4 == 400 && b4.contains("invalid sortBy"), s"$c4 $b4")
      val (c5, b5) = get("/api/health")
      assert(c5 == 200 && b5.contains("\"spark_alive\":true"), s"$c5 $b5")
      assert(b5.contains("\"active_jobs\":1"), b5) // j1 is RUNNING
    } finally server.stop(0)
  }

  test("log search params compile, bad sortBy/levels rejected") {
    import spark.implicits._
    val logs = Seq(
      graft.model.LogMessage("j1", "ERROR", "db", "boom", ts("2025-09-01 10:00:00")),
      graft.model.LogMessage("j1", "INFO", "db", "fine", ts("2025-09-01 10:00:01"))).toDF()
    val ok = QueryApi.logSearch(logs, "minLevel=WARN&q=boo&sortBy=level")
    assert(ok.isRight && ok.toOption.get.count() == 1)
    assert(QueryApi.logSearch(logs, "sortBy=bogus").isLeft)
    assert(QueryApi.logSearch(logs, "minLevel=LOUD").isLeft)
    assert(QueryApi.logSearch(logs, "maxResults=x").isLeft)
  }
}
