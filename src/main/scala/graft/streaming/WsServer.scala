package graft.streaming

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import graft.model.{ConnectionFilters, WebSocketMessage}

/** RFC 6455 WebSocket wire transport — the live-push layer over the
  * routing/QoS operators (reference: src/websocket_manager.cpp accept +
  * registry, src/websocket_connection.cpp per-connection read/write,
  * src/message_broadcaster.cpp sendToMatchingConnections). Everything
  * query-shaped lives elsewhere and is verified there: the routing
  * predicate is [[FilterManager.testFilter]] (the JVM mirror of
  * [[Routing.shouldReceive]], so a live broadcast delivers exactly the
  * rows q34's routing join predicts), filter CRUD is the REST surface
  * in [[graft.api.HttpApi]] sharing the same filter table. This file
  * only speaks the wire protocol, which is why the JDK suffices: a
  * `ServerSocket`, the SHA-1 accept-key handshake, and the frame codec
  * below (no dependency, loopback-testable with
  * `java.net.http.HttpClient.newWebSocketBuilder`).
  *
  * Auth matches the HTTP edge: the upgrade request must carry a valid
  * `Authorization: Bearer <jwt>` (HS256, [[graft.functions.Jwt]]) or
  * the server answers 401 and never upgrades — the reference performs
  * the same check before accepting the connection
  * (src/websocket_manager.cpp handleUpgrade auth gate).
  *
  * Scale note: this is a control-plane fan-out (operator dashboards —
  * the reference caps connections in the hundreds), not a data sink;
  * bulk egress stays with the batch/streaming sinks. Frame writes are
  * per-connection synchronized, broadcasts iterate the registry, and a
  * connection whose socket errors is dropped and counted rather than
  * ever blocking the loop (drop-on-full QoS is upstream in
  * [[Routing]]/[[graft.streaming.Batching]]).
  */
object WsServer {

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  final class Connection private[WsServer] (
      val connectionId: String,
      private[WsServer] val socket: Socket,
      private[WsServer] val out: OutputStream) {
    private[WsServer] val writeLock = new Object
    @volatile private[WsServer] var open = true
  }

  final class Server private[WsServer] (
      server: ServerSocket,
      jwtSecret: Array[Byte],
      filters: () => Seq[ConnectionFilters],
      clock: () => Long) {

    private val registry = new ConcurrentHashMap[String, Connection]()
    private val sent = new AtomicLong(0L)
    private val errors = new AtomicLong(0L)
    private val connSeq = new AtomicLong(0L)
    @volatile private var running = true

    def port: Int = server.getLocalPort
    def messagesSent: Long = sent.get()
    def broadcastErrors: Long = errors.get()
    def connectionIds: Seq[String] = {
      val it = registry.keys()
      val b = Seq.newBuilder[String]
      while (it.hasMoreElements) b += it.nextElement()
      b.result().sorted
    }

    /** Push one message to every connection whose filters match —
      * [[FilterManager.testFilter]] per connection, i.e. exactly the
      * pairs [[Routing.route]] would emit for the same filter table. A
      * connection with no registered filters receives everything
      * (empty-filter wildcard, reference semantics). Returns the number
      * of connections the message was delivered to. */
    def broadcast(m: WebSocketMessage): Int = {
      val subs = filters()
      val payload = messageJson(m)
      var delivered = 0
      registry.forEach { (id, conn) =>
        val f = FilterManager.get(subs, id).getOrElse(ConnectionFilters(id))
        if (FilterManager.testFilter(f, m)) {
          if (send(conn, payload)) {
            delivered += 1
            sent.incrementAndGet()
            ()
          } else {
            errors.incrementAndGet()
            drop(conn)
          }
        }
      }
      delivered
    }

    private def send(conn: Connection, payload: String): Boolean =
      conn.writeLock.synchronized {
        if (!conn.open) false
        else
          try {
            writeTextFrame(conn.out, payload)
            true
          } catch { case _: java.io.IOException => false }
      }

    private def drop(conn: Connection): Unit = {
      conn.open = false
      // two-arg remove: a connection that was REPLACED in the registry
      // (client reconnected under the same connection_id) must not
      // deregister its replacement when its old socket finally closes
      registry.remove(conn.connectionId, conn)
      try conn.socket.close() catch { case _: java.io.IOException => () }
    }

    def close(): Unit = {
      running = false
      try server.close() catch { case _: java.io.IOException => () }
      registry.forEach((_, c) => drop(c))
    }

    private[WsServer] def acceptLoop(): Unit =
      while (running)
        try {
          val sock = server.accept()
          val seq = connSeq.incrementAndGet()
          daemon(s"graft-ws-conn-$seq") {
            handshake(sock, seq)
          }
        } catch {
          case _: java.io.IOException => () // server closed or accept race
        }

    /** Read the HTTP upgrade request, enforce bearer auth, answer 101
      * with the SHA-1 accept key (RFC 6455 §4.2.2), register, then sit
      * in the frame read loop (close/ping handling). */
    private def handshake(sock: Socket, seq: Long): Unit = {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      def reject(status: String, body: String): Unit = {
        val b = body.getBytes(UTF_8)
        out.write((s"HTTP/1.1 $status\r\nContent-Type: application/json\r\n" +
          s"Content-Length: ${b.length}\r\nConnection: close\r\n\r\n").getBytes(UTF_8))
        out.write(b)
        out.flush()
        sock.close()
      }
      try {
        val head = readHead(in)
        val lines = head.split("\r\n")
        val reqPath = lines.headOption.map(_.split(" ")).filter(_.length >= 2)
          .map(_(1)).getOrElse("/")
        val headers = lines.drop(1).flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
        }.toMap
        val bearer = headers.get("authorization")
          .filter(_.regionMatches(true, 0, "Bearer ", 0, 7)).map(_.drop(7))
        val subject = bearer.flatMap(
          graft.functions.Jwt.subjectJvm(_, jwtSecret, clock()))
        if (subject.isEmpty) { reject("401 Unauthorized", """{"error":"Authentication required"}"""); return }
        val key = headers.get("sec-websocket-key")
        val upgradeOk = headers.get("upgrade").exists(_.equalsIgnoreCase("websocket"))
        if (!upgradeOk || key.isEmpty) { reject("400 Bad Request", """{"error":"Invalid WebSocket upgrade"}"""); return }
        val accept = java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("SHA-1")
            .digest((key.get + WsGuid).getBytes(UTF_8)))
        val connId = reqPath.split("\\?", 2).lift(1)
          .flatMap(_.split("&").collectFirst {
            case p if p.startsWith("connection_id=") => p.drop("connection_id=".length)
          })
          .filter(_.nonEmpty)
          .getOrElse(s"conn_$seq")
        out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
          s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
        out.flush()
        val conn = new Connection(connId, sock, out)
        // a reconnect under the same connection_id supersedes the old
        // socket (reference: registerConnection replaces); close the
        // superseded one so it can't linger half-open
        val prev = registry.put(connId, conn)
        if (prev != null) {
          prev.open = false
          try prev.socket.close() catch { case _: java.io.IOException => () }
        }
        readLoop(conn, in)
      } catch {
        case _: java.io.IOException =>
          try sock.close() catch { case _: java.io.IOException => () }
      }
    }

    /** Client-frame loop: unmask (client frames MUST be masked), answer
      * ping with pong, echo close and drop; data frames from clients are
      * ignored (the push direction is server→client; the reference's
      * inbound surface is the filter REST CRUD, not WS messages). */
    private def readLoop(conn: Connection, in: InputStream): Unit = {
      try {
        var done = false
        while (!done && conn.open) {
          val b0 = in.read()
          if (b0 < 0) done = true
          else {
            val opcode = b0 & 0x0f
            val b1 = in.read()
            if (b1 < 0) done = true
            else {
              val masked = (b1 & 0x80) != 0
              var len: Long = (b1 & 0x7f).toLong
              if (len == 126) len = ((in.read() & 0xff) << 8 | (in.read() & 0xff)).toLong
              else if (len == 127) {
                len = 0L
                var i = 0
                while (i < 8) { len = (len << 8) | (in.read() & 0xff).toLong; i += 1 }
              }
              val mask = if (masked) {
                val m = new Array[Byte](4)
                readFully(in, m)
                m
              } else Array.emptyByteArray
              val payload = new Array[Byte](math.min(len, 1 << 20).toInt)
              readFully(in, payload)
              var skip = len - payload.length
              while (skip > 0) { if (in.read() < 0) skip = 0 else skip -= 1 }
              if (masked) {
                var i = 0
                while (i < payload.length) {
                  payload(i) = (payload(i) ^ mask(i % 4)).toByte
                  i += 1
                }
              }
              opcode match {
                case 0x8 => // close: echo and drop
                  conn.writeLock.synchronized {
                    try {
                      conn.out.write(Array[Byte](0x88.toByte, 0x00))
                      conn.out.flush()
                    } catch { case _: java.io.IOException => () }
                  }
                  done = true
                case 0x9 => // ping → pong with same payload
                  conn.writeLock.synchronized {
                    try {
                      writeFrame(conn.out, 0xA, payload)
                    } catch { case _: java.io.IOException => done = true }
                  }
                case _ => () // text/binary/pong/continuation: ignored
              }
            }
          }
        }
      } catch { case _: java.io.IOException => () }
      finally drop(conn)
    }
  }

  /** Bind and serve. `port` 0 picks an ephemeral port; `filters` is the
    * live filter-table supplier — pass the same state the REST filter
    * CRUD mutates ([[graft.api.HttpApi.start]]'s `filtersRef`) so PUT
    * /api/ws/filters/<conn> immediately affects routing. */
  def start(port: Int, jwtSecret: Array[Byte],
      filters: () => Seq[ConnectionFilters],
      clock: () => Long = () => System.currentTimeMillis() / 1000): Server = {
    val ss = new ServerSocket()
    ss.bind(new java.net.InetSocketAddress("127.0.0.1", port))
    val server = new Server(ss, jwtSecret, filters, clock)
    daemon("graft-ws-accept") { server.acceptLoop() }
    server
  }

  private def daemon(name: String)(body: => Unit): Unit = {
    val t = new Thread(() => body, name)
    t.setDaemon(true)
    t.start()
  }

  private def readHead(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream()
    var last4 = 0
    var b = in.read()
    while (b >= 0) {
      buf.write(b)
      last4 = ((last4 << 8) | b) & 0xffffffff
      if (last4 == 0x0d0a0d0a || buf.size > 64 * 1024) b = -1
      else b = in.read()
    }
    new String(buf.toByteArray, UTF_8)
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Unit = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) throw new java.io.EOFException("ws frame truncated")
      off += n
    }
  }

  /** Server→client text frame (FIN, opcode 1, unmasked — RFC 6455 §5.1:
    * a server MUST NOT mask). */
  private def writeTextFrame(out: OutputStream, s: String): Unit =
    writeFrame(out, 0x1, s.getBytes(UTF_8))

  private def writeFrame(out: OutputStream, opcode: Int, b: Array[Byte]): Unit = {
    val b0 = (0x80 | opcode).toByte
    if (b.length < 126) out.write(Array(b0, b.length.toByte))
    else if (b.length < 65536)
      out.write(Array(b0, 126.toByte,
        ((b.length >> 8) & 0xff).toByte, (b.length & 0xff).toByte))
    else {
      val h = new Array[Byte](10)
      h(0) = b0
      h(1) = 127.toByte
      var i = 0
      while (i < 8) { h(9 - i) = ((b.length.toLong >> (8 * i)) & 0xff).toByte; i += 1 }
      out.write(h)
    }
    out.write(b)
    out.flush()
  }

  /** The pushed payload: same field set the reference broadcasts
    * (src/message_broadcaster.cpp message JSON). */
  def messageJson(m: WebSocketMessage): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    s"""{"type":${q(m.msgType)},"timestamp":${q(m.timestamp.toString)},""" +
      s""""data":${q(m.data)}""" +
      m.targetJobId.map(j => s""","jobId":${q(j)}""").getOrElse("") +
      m.targetLevel.map(l => s""","level":${q(l)}""").getOrElse("") + "}"
  }
}
