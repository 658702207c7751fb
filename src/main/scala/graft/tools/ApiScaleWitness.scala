package graft.tools

import org.apache.spark.sql.functions._

/** Scale pin for the nine REST endpoint groups' QUERY PATHS: binds the
  * real HTTP surface against sf-scaled frames (sf1.0: 1.5M jobs mapped
  * from `orders`, 1M log rows mapped from `events`) and drives one
  * request through every group, asserting 200s and validated-limit
  * response shapes. What this proves at scale: every handler's plan is
  * a filter/limit/aggregate over the bound frame (point lookups prune
  * to a broadcast-able filter, lists are capped at the validator's
  * 1000, counts are full-frame aggregates) — response time is bounded
  * by the frame's scan, never by response size.
  *
  * Usage: ApiScaleWitness <sfDir>
  */
object ApiScaleWitness {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.core.GraftSession.get("api-scale-witness")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = graft.core.Tables(spark, dir)
    // jobs: one per order; status/type derived from order fields, the
    // timestamp chain (created <= started <= completed) from o_orderdate
    val jobs = t.orders.select(
      concat(lit("job_"), col("o_orderkey")).as("jobId"),
      when(col("o_orderpriority").startsWith("1"), "EXTRACT")
        .when(col("o_orderpriority").startsWith("2"), "TRANSFORM")
        .when(col("o_orderpriority").startsWith("3"), "LOAD")
        .otherwise("FULL_ETL").as("jobType"),
      when(col("o_orderstatus") === "F", "COMPLETED")
        .when(col("o_orderstatus") === "O", "RUNNING")
        .otherwise("PENDING").as("status"),
      lit("src").as("sourceConfig"), lit("tgt").as("targetConfig"),
      col("o_orderdate").cast("timestamp").as("createdAt"),
      col("o_orderdate").cast("timestamp").as("startedAt"),
      when(col("o_orderstatus") === "F",
        col("o_orderdate").cast("timestamp") + expr("INTERVAL 30 MINUTES"))
        .as("completedAt"),
      lit(null).cast("string").as("errorMessage"),
      (col("o_orderkey") % 10000).cast("long").as("recordsProcessed"),
      (col("o_orderkey") % 9000).cast("long").as("recordsSuccessful"),
      (col("o_orderkey") % 1000).cast("long").as("recordsFailed"))
    val logs = t.events.select(
      concat(lit("job_"), pmod(col("event_id"), lit(1500000)) + 1).as("jobId"),
      when(col("value") > 90, "ERROR").when(col("value") > 60, "WARN")
        .otherwise("INFO").as("level"),
      col("event_type").as("component"),
      col("props").as("message"),
      col("ts").cast("timestamp").as("timestamp"),
      map().cast("map<string,string>").as("context"))
    val users = Seq(("u1", "alice", "pw1", "salt1", true, "alice@example.com"))
      .toDF("user_id", "username", "password", "password_salt", "is_active", "email")
      .select(col("user_id"), col("username"),
        graft.operators.Sessions.passwordHash(col("password"),
          col("password_salt")).as("password_hash"),
        col("password_salt"), col("is_active"), col("email"))
    val server = graft.api.HttpApi.start(0, spark, jobs, logs, Some(users),
      rateRules = Nil)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"

    var nReq = 0 // every req() lands in the perf monitor's counters
    def req(method: String, path: String, body: Option[String] = None,
        headers: Map[String, String] = Map.empty): (Int, String, Double) = {
      nReq += 1
      val t0 = System.nanoTime()
      val conn = new java.net.URL(base + path).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod(method)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        body.foreach { b =>
          conn.setDoOutput(true)
          val out = conn.getOutputStream
          try out.write(b.getBytes("UTF-8")) finally out.close()
        }
        val code = conn.getResponseCode
        val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val text = if (in == null) ""
          else try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        (code, text, (System.nanoTime() - t0) / 1e9)
      } finally conn.disconnect()
    }

    var ok = true
    def check(name: String, r: (Int, String, Double), want: Int = 200,
        contains: String = ""): Unit = {
      val (code, bdy, sec) = r
      val good = code == want && (contains.isEmpty || bdy.contains(contains))
      if (!good) ok = false
      println(f"[api-scale] $name%-28s code=$code sec=$sec%.2f " +
        f"${if (good) "ok" else s"FAIL want=$want contains=$contains got=${bdy.take(120)}"}")
    }

    try {
      // group 1: auth
      val login = req("POST", "/api/auth/login",
        Some("""{"username":"alice","password":"pw1"}"""))
      check("auth/login", login, contains = "Bearer")
      val token = graft.functions.MiniJson.topLevelString(login._2, "token").get
      val auth = Map("Authorization" -> s"Bearer $token")
      check("auth/profile", req("GET", "/api/auth/profile", headers = auth),
        contains = "alice")
      // group 2: jobs list (validator-capped response over 1.5M rows)
      check("jobs list", req("GET", "/api/jobs"), contains = "\"id\":")
      // group 3: job point status/metrics (predicate-pruned lookups)
      check("jobs status", req("GET", "/api/jobs/job_7/status"),
        contains = "\"jobId\":\"job_7\"")
      check("jobs metrics", req("GET", "/api/jobs/job_7/metrics"),
        contains = "successRate")
      // group 4: monitor/jobs with filters + limit
      check("monitor/jobs", req("GET",
        "/api/monitor/jobs?status=COMPLETED&limit=1000", headers = auth),
        contains = "\"jobId\":")
      // group 5: monitor status + metrics (full-frame aggregates)
      check("monitor/status", req("GET", "/api/monitor/status", headers = auth),
        contains = "server_status")
      check("monitor/metrics", req("GET", "/api/monitor/metrics", headers = auth),
        contains = "total_jobs\":1500000")
      // group 6: logs/search over 1M rows, capped at maxResults
      check("logs/search", req("GET",
        "/api/logs/search?minLevel=ERROR&maxResults=1000", headers = auth),
        contains = "ERROR")
      // group 7: health tree (jobCounts aggregate per hit)
      Seq("", "/status", "/ready", "/live", "/metrics", "/jobs", "/database",
        "/websocket", "/memory", "/system").foreach { p =>
        check(s"health$p", req("GET", s"/api/health$p"))
      }
      // group 8: WS filter CRUD
      check("ws/filters PUT", req("PUT", "/api/ws/filters/c1",
        Some("""{"jobIds":["job_7"],"logLevels":["ERROR"],"messageTypes":[],"includeSystemNotifications":true}""")),
        contains = "job_7")
      check("ws/filters stats", req("GET", "/api/ws/filters/stats"),
        contains = "n_connections")
      // group 9: jobs create/update (control-plane buffer)
      val created = req("POST", "/api/jobs",
        Some("""{"type":"FULL_ETL","source_config":"s","target_config":"t"}"""))
      check("jobs POST", created, contains = "scheduled")
      val newId = graft.functions.MiniJson.topLevelString(created._2, "job_id").get
      check("jobs PUT", req("PUT", s"/api/jobs/$newId",
        Some("""{"status":"cancelled"}""")), contains = "updated")
      // group 10: perf monitor under the load this witness just made —
      // not just format-asserted (ApiSpec does that) but RECONCILED:
      // the exposition's request counter must equal the witness's own
      // request count (the scrape itself included), and the percentile
      // pair must be ordered with a sane magnitude.
      val prom = req("GET", "/api/monitor/perf", headers = auth)
      check("monitor/perf prom", prom, contains = "http_requests_total")
      val promTotal = prom._2.linesIterator
        .find(_.startsWith("http_requests_total "))
        .map(_.split(' ')(1).trim.toLong).getOrElse(-1L)
      if (promTotal != nReq) {
        ok = false
        println(s"[api-scale] perf reconcile FAIL: http_requests_total=" +
          s"$promTotal, witness made $nReq requests")
      } else println(s"[api-scale] perf reconcile ok: $promTotal == $nReq")
      val pj = req("GET", "/api/monitor/perf?format=json", headers = auth)
      check("monitor/perf json", pj, contains = "\"totalRequests\":")
      def jLong(k: String): Long =
        graft.functions.MiniJson.topLevelLong(pj._2, k).getOrElse(-1L)
      val (tot, p95, p99) = (jLong("totalRequests"),
        jLong("p95ResponseTime"), jLong("p99ResponseTime"))
      // json twin counted its own scrape; p95 <= p99 by the sorted-index
      // formula; rps is the reference's integer division (never
      // fractional/scientific in the exposition)
      val rpsIntegral = pj._2.contains("\"requestsPerSecond\":") &&
        "\"requestsPerSecond\":(\\d+)[,}]".r.findFirstIn(pj._2).isDefined
      if (tot != nReq || p95 < 0 || p95 > p99 || !rpsIntegral) {
        ok = false
        println(s"[api-scale] perf json FAIL: totalRequests=$tot (want $nReq) " +
          s"p95=$p95 p99=$p99 rpsIntegral=$rpsIntegral body=${pj._2.take(200)}")
      } else println(s"[api-scale] perf json ok: total=$tot p95=$p95 p99=$p99")
    } finally graft.api.HttpApi.stop(server)
    println(s"[api-scale] ${if (ok) "PASS" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
