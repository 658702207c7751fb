package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Auth/session lifecycle as control-plane dataset operators — the engine
  * half of the reference's login/logout/profile flow
  * (reference: src/request_handler.cpp:638-830 handleAuth,
  * src/auth_manager.cpp:199-262, src/session_repository.cpp:13-189).
  * The HTTP/JWT transport edge is out of scope (SURVEY §7.1); everything
  * the reference does against its `sessions` table is here:
  *
  *   - authenticate: username + password-hash + is_active check
  *     (src/auth_manager.cpp:124-160). The reference's mock-bcrypt hash
  *     is process-local; the engine uses sha256(password || salt) as the
  *     portable analog — swapping in a real KDF changes one Column.
  *   - createSessions: session issuance per authenticated login, 24 h
  *     expiry (src/auth_manager.cpp:199-223).
  *   - validity/markExpired: validateSession plus its write-back — an
  *     expired-but-still-valid session is flipped invalid
  *     (src/auth_manager.cpp:225-239).
  *   - revoke: logout/invalidate by session id (src/auth_manager.cpp:240-251).
  *   - purgeExpired: DELETE WHERE expires_at < now
  *     (src/session_repository.cpp:163-178).
  *   - validSessions: the is_valid AND unexpired scan, newest first
  *     (src/session_repository.cpp:180-207).
  *
  * Scale: sessions are a control-plane table (≤ millions of rows) keyed
  * by session_id; every operator below is a narrow projection/filter or a
  * broadcast-ready join — no full shuffles. Point updates (revoke,
  * markExpired) are expressed as full-column rewrites here; on a real
  * deployment the table lives in a Delta/Iceberg-style format and these
  * become MERGE/DELETE on the same predicates.
  */
object Sessions {

  /** Session TTL (reference: src/auth_manager.cpp:212 — 24 h). */
  val SessionTtlHours = 24

  /** The portable password-hash column: sha256(password || salt), hex. */
  def passwordHash(password: Column, salt: Column): Column =
    sha2(concat(password, salt), 256)

  /** Authenticate login attempts against the users table: the username
    * must exist, the account must be active, and the supplied password
    * must hash to the stored hash. Returns one row per SUCCESSFUL login
    * with the user's id attached; failed attempts simply don't match
    * (the API layer turns absence into 401). */
  def authenticate(logins: DataFrame, users: DataFrame): DataFrame = {
    val u = users.select(col("user_id"), col("username"),
      col("password_hash"), col("password_salt"), col("is_active"))
    logins.join(u, Seq("username"))
      .filter(col("is_active") &&
        passwordHash(col("password"), col("password_salt")) === col("password_hash"))
      .drop("password", "password_hash", "password_salt", "is_active")
  }

  /** Session issuance for authenticated logins: DETERMINISTIC session id
    * — md5(username : user_id : issue time). This is the harness-portable
    * analog of the reference's random id generator (which cannot be
    * reproduced across engines); it is NOT a production issuance path.
    * The user_id uniquifier prevents cross-user same-second collisions;
    * two logins by the SAME user in the same second still coalesce — a
    * real deployment swaps this one Column for a CSPRNG/UUID source (and
    * loses oracle determinism, which only the harness needs). 24 h
    * expiry, valid. */
  def createSessions(authenticated: DataFrame, now: Column): DataFrame =
    authenticated.select(
      concat(lit("sess_"),
        md5(concat(col("username"), lit(":"), col("user_id").cast("string"),
          lit(":"), date_format(now, "yyyy-MM-dd HH:mm:ss"))))
        .as("session_id"),
      col("user_id"),
      now.as("created_at"),
      (now + expr(s"INTERVAL $SessionTtlHours HOURS")).as("expires_at"),
      lit(true).as("is_valid"))

  /** Per-session lifecycle status at `now`: VALID (usable), EXPIRED
    * (still flagged valid but past expiry — the write-back target), or
    * REVOKED (explicitly invalidated). */
  def validity(sessions: DataFrame, now: Column): DataFrame =
    sessions.withColumn("session_status",
      when(col("is_valid") && now < col("expires_at"), "VALID")
        .when(col("is_valid"), "EXPIRED")
        .otherwise("REVOKED"))

  /** The validateSession write-back: expired sessions lose their valid
    * flag (reference marks them invalid on first touch). */
  def markExpired(sessions: DataFrame, now: Column): DataFrame =
    sessions.withColumn("is_valid", col("is_valid") && now < col("expires_at"))

  /** Logout / admin invalidation: flip is_valid for the given ids.
    * The id set is a (small) revocation list → broadcast semi-join. */
  def revoke(sessions: DataFrame, sessionIds: DataFrame): DataFrame = {
    val ids = sessionIds.select(col("session_id")).distinct()
      .withColumn("_revoked", lit(true))
    sessions.join(broadcast(ids), Seq("session_id"), "left")
      .withColumn("is_valid", col("is_valid") && col("_revoked").isNull)
      .drop("_revoked")
  }

  /** The retention delete: drop sessions already past expiry
    * (reference: DELETE FROM sessions WHERE expires_at < now). */
  def purgeExpired(sessions: DataFrame, now: Column): DataFrame =
    sessions.filter(col("expires_at") >= now)

  /** The valid-session scan: usable sessions, newest first. */
  def validSessions(sessions: DataFrame, now: Column): DataFrame =
    sessions.filter(col("is_valid") && col("expires_at") > now)
      .orderBy(col("created_at").desc, col("session_id"))
}
