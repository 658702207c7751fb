package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Runtime coverage for the multimodal stubs beyond q37's decode path:
  * resize metadata and frame sampling. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("multimodal-spec", "4").getOrCreate()

  private def decoded = {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
    Multimodal.decodeAndFeaturize(Multimodal.syntheticMediaFrame(docs)).toDF()
  }

  test("resizeMeta preserves aspect ratio and never upscales") {
    val out = Multimodal.resizeMeta(decoded, maxDim = 256).collect()
    out.foreach { r =>
      val (w, h) = (r.getInt(r.fieldIndex("width")), r.getInt(r.fieldIndex("height")))
      val (ow, oh) = (r.getInt(r.fieldIndex("out_width")), r.getInt(r.fieldIndex("out_height")))
      assert(ow <= 256 && oh <= 256 && ow >= 1 && oh >= 1)
      assert(ow <= w && oh <= h) // scale factor capped at 1.0: no upscale
      if (w > 256 || h > 256) {
        // aspect preserved within floor-rounding of one pixel
        val scale = math.min(256.0 / w, 256.0 / h)
        assert(math.abs(ow - w * scale) <= 1 && math.abs(oh - h * scale) <= 1)
      } else assert(ow == w && oh == h)
    }
  }

  test("sampleFrames generates every-nth frame indexes up to the cap") {
    val frames = Multimodal.sampleFrames(decoded, everyNth = 2, maxFrames = 3)
    val byId = frames.groupBy("id")
      .agg(collect_list("frame_idx").as("idxs"), first("sizeBytes").as("sz"))
      .collect()
    byId.foreach { r =>
      val idxs = r.getSeq[Int](1)
      val frameCount = r.getLong(2) / 1024 + 1
      val expected = (0L until frameCount by 2).take(3).map(_.toInt)
      assert(idxs.sorted == expected.sorted,
        s"id=${r.getLong(0)} sz=${r.getLong(2)}")
    }
  }

  test("feature histogram sums to ~1 (normalized byte histogram)") {
    val rows = decoded.select(col("features")).limit(10).collect()
    rows.foreach { r =>
      val sum = r.getSeq[Float](0).map(_.toDouble).sum
      assert(math.abs(sum - 1.0) < 1e-5)
    }
  }
}
