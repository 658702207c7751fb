package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessions

/** Auth/session lifecycle semantics the oracle queries (q46/q47) don't
  * pin directly: rejection reasons, purge, and valid-session ordering. */
class SessionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("sessions-spec", "4").getOrCreate()
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def users = Seq(
    // (user_id, username, salt, password 'good', active)
    (1L, "alice", "s1", true),
    (2L, "bob", "s2", false), // inactive
    (3L, "carol", "s3", true)
  ).toDF("user_id", "username", "password_salt", "is_active")
    .withColumn("password_hash",
      Sessions.passwordHash(lit("good"), col("password_salt")))

  test("authenticate: wrong password and inactive accounts are rejected") {
    val logins = Seq(
      ("alice", "good"),  // ok
      ("bob", "good"),    // inactive → rejected
      ("carol", "bad"),   // wrong password → rejected
      ("mallory", "good") // unknown user → rejected
    ).toDF("username", "password")
    val got = Sessions.authenticate(logins, users)
      .select("username").collect().map(_.getString(0))
    assert(got.toSeq == Seq("alice"))
  }

  test("createSessions issues 24h-expiry valid sessions") {
    val auth = Seq((1L, "alice")).toDF("user_id", "username")
    val s = Sessions.createSessions(auth,
      lit("2025-01-01 00:00:00").cast("timestamp_ntz")).collect().head
    assert(s.getAs[String]("session_id").startsWith("sess_"))
    assert(s.getAs[java.time.LocalDateTime]("expires_at") ==
      java.time.LocalDateTime.parse("2025-01-02T00:00"))
    assert(s.getAs[Boolean]("is_valid"))
  }

  test("createSessions ids are unique across users in the same second") {
    // same username, distinct user_ids, same issue second — the user_id
    // uniquifier must keep the deterministic ids distinct
    val auth = Seq((1L, "alice"), (2L, "alice"), (3L, "bob"))
      .toDF("user_id", "username")
    val ids = Sessions.createSessions(auth,
      lit("2025-01-01 00:00:00").cast("timestamp_ntz"))
      .select("session_id").collect().map(_.getString(0))
    assert(ids.distinct.length == 3)
  }

  test("revoke, purge, and validSessions ordering") {
    val sessions = Seq(
      ("s1", 1L, "2025-01-01 00:00:00", "2025-01-02 00:00:00", true),
      ("s2", 2L, "2025-01-01 06:00:00", "2025-01-02 06:00:00", true),
      ("s3", 3L, "2024-12-01 00:00:00", "2024-12-02 00:00:00", true), // expired
      ("s4", 1L, "2025-01-01 12:00:00", "2025-01-02 12:00:00", false) // revoked earlier
    ).toDF("session_id", "user_id", "created_at_s", "expires_at_s", "is_valid")
      .withColumn("created_at", col("created_at_s").cast("timestamp_ntz"))
      .withColumn("expires_at", col("expires_at_s").cast("timestamp_ntz"))
      .drop("created_at_s", "expires_at_s")
    val now = lit("2025-01-01 18:00:00").cast("timestamp_ntz")

    val revoked = Sessions.revoke(sessions, Seq("s2").toDF("session_id"))
    assert(revoked.filter(col("session_id") === "s2").head.getAs[Boolean]("is_valid") == false)

    // purge drops only the already-expired row
    assert(Sessions.purgeExpired(revoked, now).count() == 3)

    // valid sessions: s1 only (s2 revoked now, s3 expired, s4 revoked),
    // newest-first ordering verified with s1+s2 unrevoked
    val valid = Sessions.validSessions(sessions, now)
      .select("session_id").collect().map(_.getString(0))
    assert(valid.toSeq == Seq("s2", "s1")) // newest first; s3 expired, s4 invalid

    val statuses = Sessions.validity(revoked, now)
      .select("session_id", "session_status").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(statuses == Map("s1" -> "VALID", "s2" -> "REVOKED",
      "s3" -> "EXPIRED", "s4" -> "REVOKED"))
  }
}
