package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST4: fixed-window rate limiting with enforce-BEFORE-increment
  * semantics (reference: src/rate_limiter.cpp:48-88 — a denied request
  * does not consume quota; windows are epoch-aligned minute/hour ids,
  * :206-215; cleanup keeps current+previous window, :132-187; rules match
  * by longest endpoint prefix with a delimiter check, :26-43, 196-201).
  *
  * Spark shape: `flatMapGroupsWithState` keyed by (clientId, ruleEndpoint)
  * — the order-sensitive check-then-increment is exactly the per-key
  * sequential semantics the reference's mutex provided, now partitioned
  * across executors by key.
  */
object RateLimiter {

  /** Per-endpoint-prefix limits (reference defaults: src/rate_limiter.cpp:12-22). */
  final case class RateRule(endpoint: String, perMinute: Int, perHour: Int)

  val DefaultRules: Seq[RateRule] = Seq(
    RateRule("/api/auth/login", 5, 20),
    RateRule("/api/auth/logout", 10, 50),
    RateRule("/api/auth/profile", 30, 200),
    RateRule("/api/logs", 60, 500),
    RateRule("/api/jobs", 30, 200),
    RateRule("/api/monitor", 120, 1000),
    RateRule("/api/health", 300, 2000))

  /** Longest-prefix rule match: the endpoint equals the rule or extends it
    * right after a delimiter (reference: src/rate_limiter.cpp:196-201). */
  def matchRule(endpoint: String, rules: Seq[RateRule] = DefaultRules): Option[RateRule] =
    rules.filter(r => endpoint == r.endpoint ||
        (endpoint.startsWith(r.endpoint) &&
          (r.endpoint.endsWith("/") || endpoint.charAt(r.endpoint.length) == '/')))
      .sortBy(-_.endpoint.length)
      .headOption

  final case class Request(clientId: String, endpoint: String, ts: Timestamp)

  final case class Decision(clientId: String, endpoint: String, ts: Timestamp,
      allowed: Boolean, minuteCount: Long, hourCount: Long)

  /** window-id → count, for the minute and hour granularities. */
  final case class WindowCounts(minute: Map[Long, Long], hour: Map[Long, Long])

  /** One request against one key's window state: the check-then-increment
    * core shared by the streaming path ([[decide]]) and the HTTP edge
    * ([[EdgeRateLimiter]]), so both enforce identical semantics — a
    * denied request does not consume quota; only current+previous windows
    * are retained (reference: src/rate_limiter.cpp:48-88, 132-187). */
  def step(cur: WindowCounts, rule: RateRule, epochSeconds: Long)
      : (WindowCounts, Boolean, Long, Long) = {
    val mWin = epochSeconds / 60
    val hWin = epochSeconds / 3600
    val mCount = cur.minute.getOrElse(mWin, 0L)
    val hCount = cur.hour.getOrElse(hWin, 0L)
    val allowed = mCount < rule.perMinute && hCount < rule.perHour
    val next =
      if (allowed) // denied requests do NOT consume quota
        WindowCounts(
          cur.minute.updated(mWin, mCount + 1).filter(_._1 >= mWin - 1),
          cur.hour.updated(hWin, hCount + 1).filter(_._1 >= hWin - 1))
      else cur
    (next, allowed, next.minute.getOrElse(mWin, 0L), next.hour.getOrElse(hWin, 0L))
  }

  def decide(key: (String, String), requests: Iterator[Request],
      state: GroupState[WindowCounts], rule: RateRule): Iterator[Decision] = {
    var cur = state.getOption.getOrElse(WindowCounts(Map.empty, Map.empty))
    val out = scala.collection.mutable.ArrayBuffer.empty[Decision]
    requests.toSeq.sortBy(_.ts.getTime).foreach { r =>
      val (next, allowed, mCount, hCount) = step(cur, rule, r.ts.getTime / 1000)
      cur = next
      out += Decision(r.clientId, r.endpoint, r.ts, allowed, mCount, hCount)
    }
    state.update(cur)
    out.iterator
  }

  /** Apply limiting over a (possibly streaming) request dataset. Requests
    * with no matching rule are always allowed with zero counts
    * (reference: src/rate_limiter.cpp:52-55). */
  def limit(requests: Dataset[Request], rules: Seq[RateRule] = DefaultRules)
      : Dataset[Decision] = {
    implicit val decEnc = Encoders.product[Decision]
    implicit val reqEnc = Encoders.product[Request]
    implicit val stEnc = Encoders.product[WindowCounts]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    requests.groupByKey(r => (r.clientId,
      matchRule(r.endpoint, rules).map(_.endpoint).getOrElse("")))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String), rs: Iterator[Request], st: GroupState[WindowCounts]) =>
          rules.find(_.endpoint == key._2) match {
            case Some(rule) => decide(key, rs, st, rule)
            case None => rs.map(r =>
              Decision(r.clientId, r.endpoint, r.ts, allowed = true, 0L, 0L))
          }
      }
  }

  /** Outcome of an edge check, with the reference's X-RateLimit header
    * fields (reference: createRateLimitResponse exposes
    * X-RateLimit-Limit / -Remaining / -Reset and Retry-After). */
  final case class EdgeDecision(allowed: Boolean, limit: Int, remaining: Long,
      resetEpochSeconds: Long, retryAfterSeconds: Long)

  /** Driver-local enforcement for the HTTP socket layer: one window-state
    * per (clientId, rule endpoint), same [[step]] math as the streaming
    * operator. The map is bounded by live (client, endpoint-group) pairs
    * — a control-plane cardinality; at a bigger edge the same keyed state
    * lives in the streaming operator instead. */
  final class EdgeRateLimiter(rules: Seq[RateRule] = DefaultRules,
      clock: () => Long = () => System.currentTimeMillis() / 1000) {
    private val states =
      scala.collection.mutable.HashMap.empty[(String, String), WindowCounts]

    def check(clientId: String, endpoint: String): EdgeDecision = synchronized {
      matchRule(endpoint, rules) match {
        case None => EdgeDecision(allowed = true, 0, 0L, 0L, 0L)
        case Some(rule) =>
          val now = clock()
          val key = (clientId, rule.endpoint)
          val cur = states.getOrElse(key, WindowCounts(Map.empty, Map.empty))
          val (next, allowed, mCount, _) = step(cur, rule, now)
          states.update(key, next)
          val resetAt = (now / 60 + 1) * 60
          EdgeDecision(allowed, rule.perMinute,
            math.max(0L, rule.perMinute - mCount), resetAt,
            if (allowed) 0L else resetAt - now)
      }
    }
  }
}
