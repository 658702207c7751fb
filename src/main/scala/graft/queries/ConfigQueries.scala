package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.ConfigFlags

/** Oracle-verified exercises of the configuration-table typed getters and
  * the feature-flag rollout (reference: src/config_manager.cpp:46-80,
  * src/feature_flags.cpp:60-80). DuckDB re-derives the stoi/stod prefix
  * parses with the same regexes and the FNV-1a64 rollout hash with a
  * HUGEINT list_reduce fold.
  */
object ConfigQueries {

  val entries: Map[String, QueryDef] = Map(

    // Typed getters over a synthesized configuration table: stoi prefix,
    // stod prefix, and the {true,1,yes,on} bool set, with parse-failure
    // defaults (-1 / -1.0).
    "q49_config_typed" -> QueryDef(
      """WITH cfg AS (
        |  SELECT 'k' || p_partkey AS key,
        |         CASE p_partkey % 5 WHEN 0 THEN '42' WHEN 1 THEN 'true'
        |              WHEN 2 THEN ' 3.25e1x' WHEN 3 THEN 'Yes'
        |              ELSE p_name END AS value,
        |         'cat' || (p_partkey % 3) AS category
        |  FROM part)
        |SELECT key, value, category,
        |  COALESCE(TRY_CAST(nullif(regexp_extract(value,
        |    '^[ \t\n\r\f\x0B]*([+-]?\d+)', 1), '') AS INT), -1) AS v_int,
        |  lower(value) IN ('true', '1', 'yes', 'on') AS v_bool,
        |  COALESCE(TRY_CAST(nullif(regexp_extract(value,
        |    '^[ \t\n\r\f\x0B]*([+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)', 1), '') AS DOUBLE), -1.0) AS v_double
        |FROM cfg ORDER BY key""".stripMargin) { (s, dir) =>
      val cfg = Tables(s, dir).part.select(
        concat(lit("k"), col("p_partkey")).as("key"),
        when(col("p_partkey") % 5 === 0, "42")
          .when(col("p_partkey") % 5 === 1, "true")
          .when(col("p_partkey") % 5 === 2, " 3.25e1x")
          .when(col("p_partkey") % 5 === 3, "Yes")
          .otherwise(col("p_name")).as("value"),
        concat(lit("cat"), col("p_partkey") % 3).as("category"))
      cfg.select(col("key"), col("value"), col("category"),
        ConfigFlags.getInt(col("value"), -1).as("v_int"),
        ConfigFlags.getBool(col("value")).as("v_bool"),
        ConfigFlags.getDouble(col("value"), -1.0).as("v_double"))
        .orderBy(col("key"))
    },

    // Percentage rollout: every (flag, user) decision, covering the
    // pct<=0, pct>=100, and hashed-bucket branches.
    "q50_feature_rollout" -> QueryDef(
      """WITH flags AS (
        |  SELECT 'feat_' || n_nationkey AS flag,
        |         CAST(n_nationkey * 5 - 10 AS DOUBLE) AS pct
        |  FROM nation),
        |users AS (
        |  SELECT 'user' || c_custkey AS username
        |  FROM customer WHERE c_custkey % 37 = 0),
        |x AS (SELECT flag, pct, username FROM flags CROSS JOIN users)
        |SELECT flag, username,
        |  CASE WHEN pct >= 100.0 THEN TRUE
        |       WHEN pct <= 0.0 THEN FALSE
        |       ELSE (CAST(list_reduce(
        |         list_prepend(CAST('1469598103934665603' AS HUGEINT),
        |           list_transform(range(length(username)),
        |             i -> CAST(unicode(substr(username, CAST(i+1 AS INT), 1)) AS HUGEINT))),
        |         (h, c) -> (xor(h, c) * CAST('1099511628211' AS HUGEINT))
        |                   % CAST('18446744073709551616' AS HUGEINT))
        |         % 10000 AS BIGINT) / 100.0) < pct END AS enabled
        |FROM x ORDER BY flag, username""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val flags = t.nation.select(
        concat(lit("feat_"), col("n_nationkey")).as("flag"),
        (col("n_nationkey") * 5 - 10).cast("double").as("pct"))
      val users = t.customer.filter(col("c_custkey") % 37 === 0)
        .select(concat(lit("user"), col("c_custkey")).as("username"))
      users.crossJoin(broadcast(flags))
        .select(col("flag"), col("username"),
          ConfigFlags.enabledForUser(col("pct"), col("username")).as("enabled"))
        .orderBy(col("flag"), col("username"))
    }
  )
}
