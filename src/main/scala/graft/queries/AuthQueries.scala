package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.Sessions

/** Oracle-verified exercises of the auth/session lifecycle operators
  * (reference: src/request_handler.cpp:638-830 handleAuth,
  * src/auth_manager.cpp:124-262, src/session_repository.cpp:13-189).
  * The DuckDB SQL re-derives authentication (sha256 password check) and
  * the full session state machine independently.
  */
object AuthQueries {

  private val Now46 = "1998-01-01 00:00:00"
  private val Now47 = "1997-06-01 00:00:00"

  val entries: Map[String, QueryDef] = Map(

    // Login → authenticate → session issuance. Wrong-password attempts
    // (every 3rd user) and inactive accounts (every 7th) must not get a
    // session (reference: src/auth_manager.cpp:124-160, 199-223).
    "q46_auth_login" -> QueryDef(
      s"""WITH users AS (
         |  SELECT c_custkey AS user_id, 'user' || c_custkey AS username,
         |         'salt' || c_custkey AS password_salt,
         |         sha256('pw' || c_custkey || 'salt' || c_custkey) AS password_hash,
         |         c_custkey % 7 <> 0 AS is_active
         |  FROM customer),
         |logins AS (
         |  SELECT 'user' || c_custkey AS username,
         |         CASE WHEN c_custkey % 3 = 0 THEN 'wrongpw'
         |              ELSE 'pw' || c_custkey END AS password
         |  FROM customer),
         |auth AS (
         |  SELECT u.user_id, l.username
         |  FROM logins l JOIN users u ON l.username = u.username
         |  WHERE u.is_active
         |    AND sha256(l.password || u.password_salt) = u.password_hash)
         |SELECT 'sess_' || md5(username || ':' || CAST(user_id AS VARCHAR) || ':' || '$Now46') AS session_id,
         |       user_id,
         |       strftime(TIMESTAMP '$Now46' + to_hours(24), '%Y-%m-%d %H:%M:%S') AS expires_at,
         |       TRUE AS is_valid
         |FROM auth ORDER BY session_id""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir).customer
      val users = c.select(
        col("c_custkey").as("user_id"),
        concat(lit("user"), col("c_custkey")).as("username"),
        concat(lit("salt"), col("c_custkey")).as("password_salt"),
        Sessions.passwordHash(
          concat(lit("pw"), col("c_custkey")),
          concat(lit("salt"), col("c_custkey"))).as("password_hash"),
        (col("c_custkey") % 7 =!= 0).as("is_active"))
      val logins = c.select(
        concat(lit("user"), col("c_custkey")).as("username"),
        when(col("c_custkey") % 3 === 0, lit("wrongpw"))
          .otherwise(concat(lit("pw"), col("c_custkey"))).as("password"))
      val now = lit(Now46).cast("timestamp_ntz")
      Sessions.createSessions(Sessions.authenticate(logins, users), now)
        .select(col("session_id"), col("user_id"),
          date_format(col("expires_at"), "yyyy-MM-dd HH:mm:ss").as("expires_at"),
          col("is_valid"))
        .orderBy(col("session_id"))
    },

    // Session state machine: revoke (logout) → validity classification →
    // expiry write-back → retention purge flag, all at a fixed `now`
    // (reference: src/auth_manager.cpp:225-262,
    // src/session_repository.cpp:163-178).
    "q47_session_lifecycle" -> QueryDef(
      s"""WITH sessions AS (
         |  SELECT 'sess_' || o_orderkey AS session_id, o_custkey AS user_id,
         |         o_orderdate AS created_at,
         |         o_orderdate + to_hours(24) AS expires_at,
         |         o_orderkey % 11 <> 0 AS is_valid,
         |         o_orderkey % 13 = 0 AS revoked
         |  FROM orders),
         |after_revoke AS (
         |  SELECT session_id, created_at, expires_at,
         |         is_valid AND NOT revoked AS is_valid
         |  FROM sessions)
         |SELECT session_id,
         |       CASE WHEN is_valid AND TIMESTAMP '$Now47' < expires_at THEN 'VALID'
         |            WHEN is_valid THEN 'EXPIRED'
         |            ELSE 'REVOKED' END AS session_status,
         |       is_valid AND TIMESTAMP '$Now47' < expires_at AS is_valid_after,
         |       expires_at >= TIMESTAMP '$Now47' AS retained
         |FROM after_revoke ORDER BY session_id LIMIT 2000""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir).orders
      val sessions = o.select(
        concat(lit("sess_"), col("o_orderkey")).as("session_id"),
        col("o_custkey").as("user_id"),
        col("o_orderdate").as("created_at"),
        (col("o_orderdate") + expr("INTERVAL 24 HOURS")).as("expires_at"),
        (col("o_orderkey") % 11 =!= 0).as("is_valid"))
      val revokeIds = o.filter(col("o_orderkey") % 13 === 0)
        .select(concat(lit("sess_"), col("o_orderkey")).as("session_id"))
      val now = lit(Now47).cast("timestamp_ntz")
      val afterRevoke = Sessions.revoke(sessions, revokeIds)
      val statuses = Sessions.validity(afterRevoke, now)
      Sessions.markExpired(statuses, now) // write-back on the classified frame
        .select(col("session_id"), col("session_status"),
          col("is_valid").as("is_valid_after"),
          (col("expires_at") >= now).as("retained"))
        .orderBy(col("session_id"))
        .limit(2000)
    }
  )
}
