package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.StringFns

/** Oracle-verified exercise of the scalar string-function library (§2.4)
  * and the users/sessions join surface (J3/S4), over frames derived from
  * the testdata tables.
  */
object StringQueries {

  val entries: Map[String, QueryDef] = Map(

    // §2.4 string library: trim variants, CI compare, split, first/last
    // replace, padding, numeric validation.
    "q38_string_functions" -> QueryDef(
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         '  ' || source || CHR(9) AS padded,
        |         source || ',' || lang || ',' || CAST(doc_id AS VARCHAR) AS csvish,
        |         lang || '-' || lang || '-' || lang AS tripled
        |  FROM documents)
        |SELECT doc_id,
        |  ltrim(padded) AS ltrimmed,
        |  rtrim(padded) AS rtrimmed,
        |  (lower(source) = lower('SRC' || CAST(doc_id % 20 AS VARCHAR))) AS ieq,
        |  starts_with(lower(source), 'src') AS starts_ci,
        |  ends_with(lower(csvish), lower(CAST(doc_id AS VARCHAR))) AS ends_ci,
        |  split_part(csvish, ',', 2) AS second_field,
        |  CASE WHEN strpos(tripled, lang) = 0 THEN tripled
        |       ELSE substr(tripled, 1, strpos(tripled, lang) - 1) || 'X' ||
        |            substr(tripled, strpos(tripled, lang) + length(lang)) END AS repl_first,
        |  CASE WHEN strpos(reverse(tripled), reverse(lang)) = 0 THEN tripled
        |       ELSE substr(tripled, 1,
        |              length(tripled) - strpos(reverse(tripled), reverse(lang)) - length(lang) + 1) ||
        |            'X' ||
        |            substr(tripled,
        |              length(tripled) - strpos(reverse(tripled), reverse(lang)) - length(lang) + 2
        |              + length(lang)) END AS repl_last,
        |  lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
        |  repeat(lang, 2) AS doubled,
        |  translate(lang, 'aeiou', 'AEIOU') AS vowels_up,
        |  regexp_matches(CAST(doc_id AS VARCHAR), '^[0-9]+$') AS is_num,
        |  regexp_matches(source, '^[A-Za-z0-9]+$') AS is_alnum,
        |  regexp_matches('3.14e2', '^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$') AS is_float
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir).documents.select(
        col("doc_id"), col("lang"), col("source"),
        concat(lit("  "), col("source"), lit("\t")).as("padded"),
        concat_ws(",", col("source"), col("lang"), col("doc_id").cast("string")).as("csvish"),
        concat_ws("-", col("lang"), col("lang"), col("lang")).as("tripled"))
      t.select(
        col("doc_id"),
        ltrim(col("padded")).as("ltrimmed"),
        rtrim(col("padded")).as("rtrimmed"),
        StringFns.iequals(col("source"),
          concat(lit("SRC"), (col("doc_id") % 20).cast("string"))).as("ieq"),
        StringFns.startsWithCI(col("source"), lit("src")).as("starts_ci"),
        StringFns.endsWithCI(col("csvish"), col("doc_id").cast("string")).as("ends_ci"),
        element_at(split(col("csvish"), ","), 2).as("second_field"),
        StringFns.replaceFirst(col("tripled"), col("lang"), lit("X")).as("repl_first"),
        StringFns.replaceLast(col("tripled"), col("lang"), lit("X")).as("repl_last"),
        lpad(col("doc_id").cast("string"), 6, "0").as("padded_id"),
        repeat(col("lang"), 2).as("doubled"),
        translate(col("lang"), "aeiou", "AEIOU").as("vowels_up"),
        StringFns.isNumeric(col("doc_id").cast("string")).as("is_num"),
        StringFns.isAlphanumeric(col("source")).as("is_alnum"),
        StringFns.isFloat(lit("3.14e2")).as("is_float"))
        .orderBy(col("doc_id"))
    },

    // J3/S4: session -> user join with role arrays, validity + expiry
    // predicates (reference: src/session_repository.cpp:46-70 +
    // src/user_repository.cpp:74-97; expiry purge :169).
    "q39_sessions" -> QueryDef(
      """WITH users AS (
        |  SELECT c_custkey AS user_id, 'user' || c_custkey AS username,
        |         CASE WHEN c_custkey % 50 = 0 THEN ['admin','user'] ELSE ['user'] END AS roles,
        |         c_custkey % 7 <> 0 AS is_active
        |  FROM customer),
        |sessions AS (
        |  SELECT 'sess_' || o_orderkey AS session_id, o_custkey AS user_id,
        |         o_orderdate AS created_at,
        |         o_orderdate + to_days(30) AS expires_at,
        |         o_orderkey % 11 <> 0 AS is_valid
        |  FROM orders)
        |SELECT s.session_id, u.username,
        |       array_to_string(u.roles, ',') AS roles,
        |       strftime(s.expires_at, '%Y-%m-%d') AS expires
        |FROM sessions s JOIN users u ON s.user_id = u.user_id
        |WHERE s.is_valid AND u.is_active
        |  AND s.expires_at > TIMESTAMP '1998-01-01 00:00:00'
        |ORDER BY s.session_id LIMIT 1000""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val users = t.customer.select(
        col("c_custkey").as("user_id"),
        concat(lit("user"), col("c_custkey")).as("username"),
        when(col("c_custkey") % 50 === 0, array(lit("admin"), lit("user")))
          .otherwise(array(lit("user"))).as("roles"),
        (col("c_custkey") % 7 =!= 0).as("is_active"))
      val sessions = t.orders.select(
        concat(lit("sess_"), col("o_orderkey")).as("session_id"),
        col("o_custkey").as("user_id"),
        col("o_orderdate").as("created_at"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("expires_at"),
        (col("o_orderkey") % 11 =!= 0).as("is_valid"))
      sessions.join(broadcast(users), Seq("user_id"))
        .filter(col("is_valid") && col("is_active") &&
          col("expires_at") > lit("1998-01-01").cast("timestamp_ntz"))
        .select(col("session_id"), col("username"),
          array_join(col("roles"), ",").as("roles"),
          date_format(col("expires_at"), "yyyy-MM-dd").as("expires"))
        .orderBy(col("session_id"))
        .limit(1000)
    },

    // §1.2 sentinel codec: epoch-0 writes as NULL; literal "NULL" reads
    // as null (reference: src/etl_job_repository.cpp:22-27, 382-389).
    "q44_sentinel_codec" -> QueryDef(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |       ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS written,
        |  CASE WHEN o_orderkey % 17 = 0 THEN NULL
        |       ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS readback
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin) { (s, dir) =>
      import graft.functions.Codecs
      val o = Tables(s, dir).orders
      val tsCol = when(col("o_orderkey") % 13 === 0,
        lit("1970-01-01 00:00:00").cast("timestamp"))
        .otherwise(col("o_orderdate").cast("timestamp"))
      val wire = when(col("o_orderkey") % 17 === 0, lit("NULL"))
        .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      o.select(col("o_orderkey"),
        Codecs.writeTimestampSentinel(tsCol).as("written"),
        Codecs.formatTimestamp(Codecs.readTimestampSentinel(wire)).as("readback"))
        .orderBy(col("o_orderkey"))
        .limit(2000)
    }
  )
}
