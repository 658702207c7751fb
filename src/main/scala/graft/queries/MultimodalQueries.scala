package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.operators.Multimodal

/** Oracle-verified exercise of the multimodal plumbing: the payload is a
  * deterministic 32-byte fake (md5-chain of the text), decoded through the
  * real mapPartitions path; DuckDB re-derives width/height/byteSum from
  * the same hex string with pure SQL nibble arithmetic.
  */
object MultimodalQueries {

  /** Sum of byte values of a 32-byte payload given as a 64-char hex
    * string: Σ (hi-nibble·16 + lo-nibble). */
  private val ByteSumSql =
    """list_sum(list_transform(range(32), i ->
      |  (strpos('0123456789abcdef', substr(h, i*2 + 1, 1)) - 1) * 16 +
      |  (strpos('0123456789abcdef', substr(h, i*2 + 2, 1)) - 1)))""".stripMargin

  private def nibble(s: String, pos: String) =
    s"(strpos('0123456789abcdef', substr($s, $pos, 1)) - 1)"

  val entries: Map[String, QueryDef] = Map(

    "q37_multimodal_decode" -> QueryDef(
      s"""WITH m AS (
         |  SELECT doc_id AS id,
         |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS mediaType,
         |    length(text) AS sizeBytes,
         |    md5(text) || md5(md5(text)) AS h
         |  FROM documents)
         |SELECT id, mediaType, sizeBytes,
         |  CAST(1 + (${nibble("h", "1")} * 256 + ${nibble("h", "2")} * 16 + ${nibble("h", "3")}) AS BIGINT) AS width,
         |  CAST(1 + (${nibble("h", "5")} * 256 + ${nibble("h", "6")} * 16 + ${nibble("h", "7")}) AS BIGINT) AS height,
         |  CAST($ByteSumSql AS BIGINT) AS byteSum
         |FROM m ORDER BY id""".stripMargin) { (s, dir) =>
      val media = Multimodal.syntheticMediaFrame(Tables(s, dir).documents)
      Multimodal.decodeAndFeaturize(media).toDF()
        .select(col("id"), col("mediaType"), col("sizeBytes"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("byteSum"))
        .orderBy(col("id"))
    },

    // Resize planning over the decoded frame: scale-to-fit a 256 box,
    // never upscale, floor to ints with a 1-pixel floor.
    "q52_multimodal_resize" -> QueryDef(
      s"""WITH m AS (
         |  SELECT doc_id AS id, md5(text) || md5(md5(text)) AS h
         |  FROM documents),
         |d AS (
         |  SELECT id,
         |    CAST(1 + (${nibble("h", "1")} * 256 + ${nibble("h", "2")} * 16 + ${nibble("h", "3")}) AS BIGINT) AS width,
         |    CAST(1 + (${nibble("h", "5")} * 256 + ${nibble("h", "6")} * 16 + ${nibble("h", "7")}) AS BIGINT) AS height
         |  FROM m),
         |sc AS (
         |  SELECT id, width, height,
         |         least(256.0 / width, 256.0 / height, 1.0) AS scale
         |  FROM d)
         |SELECT id, width, height,
         |       CAST(GREATEST(CAST(floor(width * scale) AS BIGINT), 1) AS INT) AS out_width,
         |       CAST(GREATEST(CAST(floor(height * scale) AS BIGINT), 1) AS INT) AS out_height
         |FROM sc ORDER BY id""".stripMargin) { (s, dir) =>
      val media = Multimodal.syntheticMediaFrame(Tables(s, dir).documents)
      val decoded = Multimodal.decodeAndFeaturize(media).toDF()
        .select(col("id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
      Multimodal.resizeMeta(decoded, maxDim = 256)
        .select(col("id"), col("width"), col("height"),
          col("out_width"), col("out_height"))
        .orderBy(col("id"))
    },

    // Frame sampling for video rows: every 3rd frame index, max 5, from
    // the fake 1-frame-per-KiB count — one output row per sampled frame.
    "q53_multimodal_frames" -> QueryDef(
      """WITH v AS (
        |  SELECT doc_id AS id, length(text) AS sizeBytes
        |  FROM documents WHERE doc_id % 3 = 2),
        |fc AS (
        |  SELECT id, CAST(trunc(sizeBytes / 1024.0) AS INT) + 1 AS frameCount
        |  FROM v)
        |SELECT id, CAST(unnest((range(0, frameCount, 3))[1:5]) AS INT) AS frame_idx
        |FROM fc ORDER BY id, frame_idx""".stripMargin) { (s, dir) =>
      // doc_id % 3 = 2 → mediaType 'video' in syntheticMediaFrame
      val media = Multimodal.syntheticMediaFrame(Tables(s, dir).documents)
        .toDF().filter(col("meta.mediaType") === "video")
        .select(col("id"), col("meta.sizeBytes").as("sizeBytes"))
      Multimodal.sampleFrames(media, everyNth = 3, maxFrames = 5)
        .select(col("id"), col("frame_idx"))
        .orderBy(col("id"), col("frame_idx"))
    }
  )
}
