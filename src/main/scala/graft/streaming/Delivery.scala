package graft.streaming

/** ST9: delivery policy + notification dispatch — the reference's
  * NotificationServiceImpl retry/backoff machinery and delivery-method
  * fan-out (reference: include/notification_service.hpp:22-131:
  * retry queue with exponential backoff, base 5 s, max 5 min, up to 3
  * attempts; delivery methods LOG / EMAIL / WEBHOOK / SLACK).
  *
  * The policy object is shared by every push-style sink in the engine
  * (LogShipper destinations use it too), so retry semantics are defined
  * once. Network transports are stubbed (no egress in this environment);
  * the LOG method and the policy logic — attempt accounting, backoff
  * schedule, failure isolation — are real and spec-verified.
  */
object Delivery {

  /** Exponential-backoff retry policy
    * (reference: include/notification_service.hpp:107-131). */
  final case class RetryPolicy(
      maxAttempts: Int = 3,                    // total tries, incl. the first
      baseDelayMillis: Long = 5000,            // reference: 5 s base
      maxDelayMillis: Long = 5L * 60 * 1000,   // reference: 5 min cap
      backoffMultiplier: Double = 2.0) {

    /** Delay BEFORE retry `attempt` (attempt 2 waits base, 3 waits
      * base·mult, ...), capped at maxDelayMillis. */
    def delayBefore(attempt: Int): Long =
      math.min(maxDelayMillis,
        (baseDelayMillis * math.pow(backoffMultiplier, (attempt - 2).max(0))).toLong)
  }

  sealed trait Outcome { def attempts: Int }
  final case class Delivered(attempts: Int) extends Outcome
  final case class Failed(attempts: Int, error: String) extends Outcome

  /** Run `send` under the policy. Never throws: a final failure is
    * returned as [[Failed]] so one destination's outage cannot take down
    * the others (the reference logs and continues per destination).
    * `sleeper` is injectable so specs verify the backoff schedule without
    * wall-clock sleeps. */
  def deliver(policy: RetryPolicy, sleeper: Long => Unit = Thread.sleep)(
      send: () => Unit): Outcome = {
    var attempt = 1
    while (true) {
      try { send(); return Delivered(attempt) }
      catch {
        case e: Exception =>
          if (attempt >= policy.maxAttempts)
            return Failed(attempt, String.valueOf(e.getMessage))
          attempt += 1
          sleeper(policy.delayBefore(attempt))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One alert to dispatch (the alert stream rows of LogShipper.alerts). */
  final case class Notification(alertType: String, subject: String, body: String)

  /** A delivery method: LOG is real; EMAIL/WEBHOOK/SLACK are transport
    * stubs sharing the identical dispatch/retry path
    * (reference: include/notification_service.hpp:22-40). */
  final case class Method(name: String, send: Notification => Unit)

  /** The real LOG method (reference delivery method LOG). */
  def logMethod(sink: String => Unit = s => System.err.println(s)): Method =
    Method("LOG", n => sink(s"[ALERT:${n.alertType}] ${n.subject} — ${n.body}"))

  /** Per-method outcome record for the stats surface. */
  final case class Dispatch(method: String, outcome: Outcome)

  /** Fan one notification out to every configured method under the retry
    * policy; failures are isolated per method. */
  def dispatch(n: Notification, methods: Seq[Method],
      policy: RetryPolicy = RetryPolicy(),
      sleeper: Long => Unit = Thread.sleep): Seq[Dispatch] =
    methods.map(m => Dispatch(m.name, deliver(policy, sleeper)(() => m.send(n))))
}
