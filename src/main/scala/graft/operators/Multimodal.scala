package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * partition-batched transforms.
  *
  * The Scala-idiomatic equivalent of Python's `mapInPandas` is
  * `Dataset.mapPartitions` with a product encoder: one JVM call per
  * partition, rows streamed through an iterator (never materialized
  * whole), output schema declared by the case class. At 100 TB the
  * decode cost dominates — this shape keeps it embarrassingly parallel,
  * pipelined with the scan, with no shuffle before or after.
  *
  * STUB NOTE: real codecs (JPEG/PNG/ffmpeg) are not in this container, so
  * [[FakeCodec]] is a clearly-marked deterministic stand-in: it "decodes"
  * a payload into dimensions + a byte-statistics feature vector derived
  * only from the bytes. The Spark-side plumbing — schema, batching,
  * partition mapping, metadata propagation — is real and tested; swapping
  * FakeCodec for a JNI/ffi codec changes no plan shape.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(
      mediaType: String, // image | audio | video
      format: String,    // fake-rgb | fake-pcm | ...
      sizeBytes: Long)

  final case class MediaRow(id: Long, meta: MediaMeta, payload: Array[Byte])

  final case class DecodedRow(
      id: Long,
      mediaType: String,
      sizeBytes: Long,
      width: Int,
      height: Int,
      byteSum: Long,
      features: Array[Float])

  /** Deterministic fake codec — replace with a real decoder in production.
    * Width/height derive from the first 4 bytes; the feature vector is a
    * 16-bin byte histogram normalized to [0,1]. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Long, Array[Float]) = {
      val w = 1 + (java.lang.Byte.toUnsignedInt(payload(0)) << 4 |
        java.lang.Byte.toUnsignedInt(payload(1)) >> 4)
      val h = 1 + (java.lang.Byte.toUnsignedInt(payload(2)) << 4 |
        java.lang.Byte.toUnsignedInt(payload(3)) >> 4)
      var sum = 0L
      val hist = new Array[Float](16)
      payload.foreach { b =>
        val u = java.lang.Byte.toUnsignedInt(b)
        sum += u
        hist(u >> 4) += 1f
      }
      val n = payload.length.toFloat
      (w, h, sum, hist.map(_ / n))
    }
  }

  /** Decode + feature-extract as a partition-batched transform. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { rows =>
      // per-partition batch: codec state (real codecs have expensive init)
      // is constructed once here, then streamed over the rows
      rows.map { r =>
        val (w, h, sum, feats) = FakeCodec.decode(r.payload)
        DecodedRow(r.id, r.meta.mediaType, r.meta.sizeBytes, w, h, sum, feats)
      }
    }
  }

  /** Resize stub: recompute metadata for a target box, payload untouched
    * (a real impl transforms bytes; the plan shape is identical). */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(maxDim) / col("width"), lit(maxDim) / col("height"), lit(1.0))
    decoded
      .withColumn("out_width", greatest(floor(col("width") * scale), lit(1)).cast("int"))
      .withColumn("out_height", greatest(floor(col("height") * scale), lit(1)).cast("int"))
  }

  /** Frame-sampling stub for video rows: one output row per sampled frame
    * index — a generator (posexplode) over a computed index array, the
    * same shape a real ffmpeg frame extractor feeds. */
  def sampleFrames(media: DataFrame, everyNth: Int, maxFrames: Int): DataFrame = {
    val frameCount = (col("sizeBytes") / 1024).cast("int") + 1 // fake: 1 frame/KiB
    media.withColumn("frame_idx",
      explode(slice(sequence(lit(0), frameCount - 1, lit(everyNth)), 1, maxFrames)))
  }

  /** Build a deterministic fake media frame from the documents table
    * (payload = md5-chain bytes of the text) — test/bench input only. */
  def syntheticMediaFrame(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    implicit val enc = Encoders.product[MediaRow]
    docs.select(
      col("doc_id").as("id"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("mediaType"),
        lit("fake-rgb").as("format"),
        length(col("text")).cast("long").as("sizeBytes")).as("meta"),
      // 32 deterministic bytes: md5(text) ++ md5(md5(text))
      unhex(concat(md5(col("text")), md5(md5(col("text"))))).as("payload"))
      .as[MediaRow]
  }
}
