package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The thin HTTP wire over the §2.11 surface — the last layer of the
  * reference's REST stack (reference: src/http_server.cpp routing,
  * src/request_handler.cpp:1172-1318 monitor/jobs, :1489-1820 health).
  * Everything below the route handler — param parse, validation, the
  * compiled query plan, the JSON row shape — lives in [[QueryApi]] and is
  * oracle-/spec-verified; this file only binds sockets, which is why the
  * JDK's built-in server suffices (no dependency, loopback-testable in a
  * no-egress sandbox).
  *
  * Response sizes are bounded BY THE VALIDATOR (limit/maxResults ≤ 1000,
  * reference: src/input_validator.cpp:782-795), so the driver-side
  * collect in each handler is the reference's own REST contract, not a
  * scale hazard: this surface serves operators' dashboards, not bulk
  * export — bulk egress is the job of the sinks (parquet/JDBC/log
  * shipping), never the REST layer.
  */
object HttpApi {

  /** Bind and start. `port` 0 picks an ephemeral port (tests); the
    * returned server reports it via `getAddress.getPort`. `jobs` and
    * `logs` are the prepared frames the routes query — at scale these
    * are registered views over the job store / log source, planned per
    * request with the caller's filters pushed down. */
  def start(port: Int, spark: SparkSession, jobs: DataFrame,
      logs: DataFrame): HttpServer = {
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)

    server.createContext("/api/monitor/jobs", (ex: HttpExchange) =>
      handle(ex) {
        QueryApi.monitorJobs(jobs, rawQuery(ex)).map { df =>
          // monitorJobsJson emits one pre-rendered JSON object per row
          "[" + df.collect().map(_.getString(0)).mkString(",") + "]"
        }
      })

    server.createContext("/api/logs/search", (ex: HttpExchange) =>
      handle(ex) {
        QueryApi.logSearch(logs, rawQuery(ex)).map { df =>
          "[" + df.toJSON.collect().mkString(",") + "]"
        }
      })

    server.createContext("/api/health", (ex: HttpExchange) =>
      handle(ex) {
        Right(QueryApi.health(spark, Some(jobs)).toJSON.collect().head)
      })

    server.setExecutor(null)
    server.start()
    server
  }

  private def rawQuery(ex: HttpExchange): String =
    Option(ex.getRequestURI.getRawQuery).getOrElse("")

  /** Uniform envelope: validation failures are 400 with a JSON error
    * (the reference's handleValidationError shape); handler crashes are
    * 500, never a dropped connection. */
  private def handle(ex: HttpExchange)(body: => Either[String, String]): Unit = {
    val (code, payload) =
      try body match {
        case Right(json) => (200, json)
        case Left(err)   => (400, s"""{"error":${quote(err)}}""")
      } catch {
        case scala.util.control.NonFatal(e) =>
          (500, s"""{"error":${quote(String.valueOf(e.getMessage))}}""")
      }
    val bytes = payload.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""
}
