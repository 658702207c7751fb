package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.Validators
import graft.model.TransformationRule
import graft.rules.RuleCompiler

/** Oracle-verified exercises of the rule compiler (T1-T5) and the
  * validation/security predicate library (P12-P14) over the documents
  * table. The DuckDB SQL re-derives each transform's expected output
  * independently (it does not share the compiler), so a hash match means
  * the compiled Column semantics are right.
  */
object RuleQueries {

  val entries: Map[String, QueryDef] = Map(

    // T1-T5 + ordering + unknown-type + skip-missing-source semantics
    // (reference: src/data_transformer.cpp:57-69, 100-170).
    "q19_transform_rules" -> QueryDef(
      """SELECT doc_id,
        |  upper(lang) AS lang_upper,
        |  upper(source) AS source,
        |  lang AS lang_trim,
        |  CASE WHEN n_chars % 2 = 0 THEN CAST(n_chars * 3 // 2 AS VARCHAR)
        |       ELSE CAST(CAST(n_chars AS DOUBLE) * 1.5 AS VARCHAR) END AS chars_x,
        |  CAST(n_chars * 2 AS VARCHAR) AS px_x,
        |  lang AS lang_num,
        |  CASE WHEN n_chars % 2 = 0 THEN CAST(n_chars * 3 // 2 AS VARCHAR) || '.25'
        |       ELSE CAST(CAST(n_chars AS DOUBLE) * 1.5 + 0.25 AS VARCHAR) END AS chars_x2,
        |  lang AS lang_rot
        |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin) { (s, dir) =>
      val padded = Tables(s, dir).documents.select(
        col("doc_id"), col("lang"), col("source"),
        concat(lit("  "), col("lang"), lit("\t")).as("lang_pad"),
        col("n_chars").cast("string").as("n_chars_str"),
        concat(col("n_chars").cast("string"), lit("px")).as("n_px"))
      val rules = Seq(
        TransformationRule("lang", "lang_upper", "uppercase"),
        TransformationRule("source", "source", "uppercase"),
        TransformationRule("lang_pad", "lang_trim", "trim"),
        TransformationRule("n_chars_str", "chars_x", "multiply", Map("factor" -> "1.5")),
        TransformationRule("n_px", "px_x", "multiply", Map("factor" -> "2")),
        TransformationRule("lang", "lang_num", "add", Map("addend" -> "1")),
        // reads chars_x produced above — verifies in-order application
        TransformationRule("chars_x", "chars_x2", "add", Map("addend" -> "0.25")),
        TransformationRule("no_such_col", "nope", "uppercase"), // skipped
        TransformationRule("lang", "lang_rot", "rot13")) // unknown → identity
      // Sort+limit BEFORE the rule pipeline: the rules are row-wise and
      // doc_id is untouched, so TakeOrdered(500) first is semantically
      // identical but transforms 500 rows instead of the whole table —
      // the right plan at 100 TB (Catalyst can't hoist a sort through a
      // projection on its own).
      RuleCompiler(padded.orderBy(col("doc_id")).limit(500), rules)
        .select(col("doc_id"), col("lang_upper"), col("source"),
          col("lang_trim"), col("chars_x"), col("px_x"), col("lang_num"),
          col("chars_x2"), col("lang_rot"))
        .orderBy(col("doc_id"))
    },

    // P13 validation predicates (reference: src/input_validator.cpp:136-189).
    "q20_validation" -> QueryDef(
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN source || '@@bad' ELSE source || '@example.com' END AS email,
        |  (length(CASE WHEN doc_id % 3 = 0 THEN source || '@@bad' ELSE source || '@example.com' END) BETWEEN 5 AND 254)
        |    AND regexp_matches(CASE WHEN doc_id % 3 = 0 THEN source || '@@bad' ELSE source || '@example.com' END,
        |                       '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$') AS email_ok,
        |  (length(CASE WHEN doc_id % 2 = 0 THEN 'Ab1' || source || 'xxxx' ELSE source END) BETWEEN 8 AND 128)
        |    AND regexp_matches(CASE WHEN doc_id % 2 = 0 THEN 'Ab1' || source || 'xxxx' ELSE source END, '[A-Z]')
        |    AND regexp_matches(CASE WHEN doc_id % 2 = 0 THEN 'Ab1' || source || 'xxxx' ELSE source END, '[a-z]')
        |    AND regexp_matches(CASE WHEN doc_id % 2 = 0 THEN 'Ab1' || source || 'xxxx' ELSE source END, '[0-9]') AS password_ok,
        |  regexp_matches(source, '^[a-zA-Z0-9_-]{1,64}$') AS jobid_ok,
        |  regexp_matches(strftime(make_timestamp(2024,1,1,0,0,0) , '%Y-%m-%dT%H:%M:%S'),
        |                 '^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{3})?Z?$') AS iso_ok
        |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin) { (s, dir) =>
      val email = when(col("doc_id") % 3 === 0, concat(col("source"), lit("@@bad")))
        .otherwise(concat(col("source"), lit("@example.com")))
      val pwd = when(col("doc_id") % 2 === 0, concat(lit("Ab1"), col("source"), lit("xxxx")))
        .otherwise(col("source"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        email.as("email"),
        Validators.isValidEmail(email).as("email_ok"),
        Validators.isValidPassword(pwd).as("password_ok"),
        Validators.isValidJobId(col("source")).as("jobid_ok"),
        Validators.isValidIso8601(
          date_format(lit("2024-01-01").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss")).as("iso_ok"))
        .orderBy(col("doc_id"))
        .limit(500)
    },

    // P12 security predicates + sanitize (reference: src/input_validator.cpp:682-756, 577-587).
    "q21_security" -> QueryDef(
      """WITH doctored AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' UNION SELECT 1'
        |         WHEN doc_id % 11 = 0 THEN text || ' <ScRiPt>alert(1)'
        |         ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  (strpos(lower(t), ''' or ''1''=''1') > 0 OR strpos(lower(t), ''' or 1=1') > 0
        |   OR strpos(lower(t), '''; drop table') > 0 OR strpos(lower(t), '''; delete from') > 0
        |   OR strpos(lower(t), 'union select') > 0 OR strpos(lower(t), '/*') > 0
        |   OR strpos(lower(t), '*/') > 0 OR strpos(lower(t), 'xp_') > 0
        |   OR strpos(lower(t), 'sp_') > 0) AS sqli,
        |  (strpos(lower(t), '<script') > 0 OR strpos(lower(t), 'javascript:') > 0
        |   OR strpos(lower(t), 'alert(') > 0 OR strpos(lower(t), '<iframe') > 0
        |   OR strpos(lower(t), 'eval(') > 0 OR strpos(lower(t), 'onload=') > 0) AS xss,
        |  replace(replace(replace(replace('"x' || chr(9) || 'y' || chr(10), '"', ''''),
        |          chr(10), ' '), chr(13), ' '), chr(9), ' ') AS sanitized
        |FROM doctored ORDER BY doc_id LIMIT 500""".stripMargin) { (s, dir) =>
      val t = when(col("doc_id") % 7 === 0, concat(col("text"), lit(" UNION SELECT 1")))
        .when(col("doc_id") % 11 === 0, concat(col("text"), lit(" <ScRiPt>alert(1)")))
        .otherwise(col("text"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        Validators.containsSqlInjection(t).as("sqli"),
        Validators.containsXss(t).as("xss"),
        Validators.sanitizeString(lit("\"x\ty\n")).as("sanitized"))
        .orderBy(col("doc_id"))
        .limit(500)
    }
  )
}
