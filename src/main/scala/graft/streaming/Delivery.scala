package graft.streaming

/** ST9: delivery policy + notification dispatch — the reference's
  * NotificationServiceImpl retry/backoff machinery and delivery-method
  * fan-out (reference: include/notification_service.hpp:22-131:
  * retry queue with exponential backoff, base 5 s, max 5 min, up to 3
  * attempts; delivery methods LOG / EMAIL / WEBHOOK / SLACK).
  *
  * The policy object is shared by every push-style sink in the engine
  * (LogShipper destinations use it too), so retry semantics are defined
  * once. All four delivery methods are REAL wire transports: LOG writes
  * a sink line, WEBHOOK and SLACK POST over [[LogShipper.postString]]
  * (the engine's one HTTP stack), EMAIL speaks actual SMTP over a TCP
  * socket (the syslog-TCP precedent). Specs round-trip each against
  * in-JVM servers — flaky-503 retries, bad SMTP reply codes, per-method
  * isolation.
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

  /** A delivery method — all four (LOG/EMAIL/WEBHOOK/SLACK) carry real
    * transports sharing the identical dispatch/retry path
    * (reference: include/notification_service.hpp:22-40). */
  final case class Method(name: String, send: Notification => Unit)

  /** The real LOG method (reference delivery method LOG). */
  def logMethod(sink: String => Unit = s => System.err.println(s)): Method =
    Method("LOG", n => sink(s"[ALERT:${n.alertType}] ${n.subject} — ${n.body}"))

  /** Minimal JSON string escaping for the alert payload builders —
    * quotes, backslashes, and control characters (the cloudWatch writer
    * convention). */
  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The real WEBHOOK method (reference delivery method WEBHOOK): POST
    * the alert as a JSON object to the configured URL via the engine's
    * shared HTTP writer. A non-2xx status throws into [[deliver]]'s
    * retry/backoff machinery — the same at-least-once contract as the
    * LogShipper destinations. */
  def webhookMethod(url: String, connectTimeoutMillis: Int = 5000,
      readTimeoutMillis: Int = 10000): Method =
    Method("WEBHOOK", { n =>
      val body = s"""{"alertType":"${jsonEsc(n.alertType)}",""" +
        s""""subject":"${jsonEsc(n.subject)}","body":"${jsonEsc(n.body)}"}"""
      LogShipper.postString(url, body,
        Seq("Content-Type" -> "application/json"),
        connectTimeoutMillis, readTimeoutMillis)
      ()
    })

  /** The real SLACK method (reference delivery method SLACK): the
    * incoming-webhook wire shape — a `{"text": ...}` JSON POST, subject
    * bolded above the body (Slack mrkdwn). Slack acknowledges with
    * HTTP 200 body `ok`; any other body (e.g. `invalid_payload`,
    * which Slack can return WITH a 200) throws into the retry
    * machinery, the ES-`errors:true` lesson applied to this wire. */
  def slackMethod(webhookUrl: String, connectTimeoutMillis: Int = 5000,
      readTimeoutMillis: Int = 10000): Method =
    Method("SLACK", { n =>
      val text = s"*[${n.alertType}] ${n.subject}*\n${n.body}"
      val resp = LogShipper.postString(webhookUrl,
        s"""{"text":"${jsonEsc(text)}"}""",
        Seq("Content-Type" -> "application/json"),
        connectTimeoutMillis, readTimeoutMillis)
      if (resp.trim != "ok")
        sys.error(s"Slack webhook did not ack: ${resp.take(120)}")
    })

  /** The real EMAIL method (reference delivery method EMAIL): actual
    * SMTP over a TCP socket — greeting/HELO/MAIL FROM/RCPT TO/DATA/QUIT
    * with reply-code checking at every step (RFC 5321), dot-stuffed
    * body, CRLF line endings. Any 4xx/5xx reply throws into the retry
    * machinery (a 4xx is the SMTP-native "try again later"). No TLS —
    * this targets a local relay, the standard fleet posture; a direct
    * internet MTA would front this with a TLS tunnel. */
  def emailMethod(host: String, port: Int, from: String, to: String,
      heloDomain: String = "graft.local",
      timeoutMillis: Int = 10000): Method =
    Method("EMAIL", { n =>
      val sock = new java.net.Socket()
      try {
        sock.connect(new java.net.InetSocketAddress(host, port), timeoutMillis)
        sock.setSoTimeout(timeoutMillis)
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        val out = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"))
        def expect(code: Int): Unit = {
          // multi-line replies: "250-..." continues, "250 ..." ends
          var line = in.readLine()
          while (line != null && line.length >= 4 && line.charAt(3) == '-')
            line = in.readLine()
          if (line == null || !line.startsWith(code.toString))
            sys.error(s"SMTP expected $code, got: ${String.valueOf(line)}")
        }
        def send(cmd: String, code: Int): Unit = {
          out.write(cmd); out.write("\r\n"); out.flush(); expect(code)
        }
        expect(220)
        send(s"HELO $heloDomain", 250)
        send(s"MAIL FROM:<$from>", 250)
        send(s"RCPT TO:<$to>", 250)
        send("DATA", 354)
        val message =
          s"""From: <$from>
             |To: <$to>
             |Subject: [${n.alertType}] ${n.subject}
             |
             |${n.body}""".stripMargin
        message.split("\n", -1).foreach { raw =>
          val line = raw.stripSuffix("\r")
          // dot-stuffing: a body line starting with '.' doubles it so the
          // lone-dot terminator below stays unambiguous (RFC 5321 §4.5.2)
          out.write(if (line.startsWith(".")) "." + line else line)
          out.write("\r\n")
        }
        send(".", 250)
        send("QUIT", 221)
      } finally sock.close()
    })

  /** Per-method outcome record for the stats surface. */
  final case class Dispatch(method: String, outcome: Outcome)

  /** Fan one notification out to every configured method under the retry
    * policy; failures are isolated per method. */
  def dispatch(n: Notification, methods: Seq[Method],
      policy: RetryPolicy = RetryPolicy(),
      sleeper: Long => Unit = Thread.sleep): Seq[Dispatch] =
    methods.map(m => Dispatch(m.name, deliver(policy, sleeper)(() => m.send(n))))
}
