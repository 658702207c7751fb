package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.functions.StringFns

/** JSON scalar surface (§2.4 JSON group: extractJsonField, validity,
  * to_json/from_json — reference: include/job_monitoring_models.hpp:
  * 247-288, src/input_validator.cpp:538-552, 590-635) over the events
  * table's `props` JSON payload column.
  */
object JsonQueries {

  val entries: Map[String, QueryDef] = Map(

    "q40_json_functions" -> QueryDef(
      """WITH doctored AS (
        |  SELECT event_id, event_type,
        |         CASE WHEN event_id % 13 = 0 THEN substr(props, 1, length(props) - 1)
        |              ELSE props END AS j
        |  FROM events)
        |SELECT event_id,
        |  json_extract_string(CASE WHEN json_valid(j) THEN j END, '$.k') AS k_str,
        |  CAST(json_extract(CASE WHEN json_valid(j) THEN j END, '$.k') AS BIGINT) AS k_num,
        |  json_valid(j) AS valid,
        |  CASE WHEN json_valid(j)
        |       THEN CAST(json_extract(j, '$.k') AS BIGINT) * 2 ELSE -1 END AS k_doubled
        |FROM doctored ORDER BY event_id LIMIT 5000""".stripMargin) { (s, dir) =>
      // every 13th row gets its JSON truncated → invalid
      val j = when(col("event_id") % 13 === 0,
        expr("substring(props, 1, length(props) - 1)")).otherwise(col("props"))
      val valid = StringFns.isValidJsonObject(j)
      val safeJ = when(valid, j)
      Tables(s, dir).events.select(
        col("event_id"),
        StringFns.extractJsonField(safeJ, "k").as("k_str"),
        StringFns.extractJsonField(safeJ, "k").cast("long").as("k_num"),
        valid.as("valid"),
        when(valid, StringFns.extractJsonField(j, "k").cast("long") * 2)
          .otherwise(lit(-1L)).as("k_doubled"))
        .orderBy(col("event_id"))
        .limit(5000)
    }
  )
}
