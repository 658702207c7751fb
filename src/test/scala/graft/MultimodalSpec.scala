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

  // -- real codec (javax.imageio) ------------------------------------

  private def pngBytes(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaOf(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, p) =>
      Multimodal.MediaRow(id,
        Multimodal.MediaMeta("image", "png", p.length.toLong), p)
    })
  }

  test("ImageIO decode: real PNG and JPEG dims + luma features; garbage quarantined") {
    val red = pngBytes(64, 48)((_, _) => 0xFF0000) // luma 76 -> bin 4
    val grad = pngBytes(20, 10)((x, _) => x * 12 << 16 | x * 12 << 8 | x * 12)
    val jpegImg = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jpegImg, "jpg", jbos)
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val out = Multimodal.decodeImages(
      mediaOf((1L, red), (2L, grad), (3L, jbos.toByteArray), (4L, garbage)))
      .collect().map(r => r.id -> r).toMap

    assert(out(1L).decoded && out(1L).width == 64 && out(1L).height == 48)
    // solid red: every pixel's Rec.601 luma is 76 -> all mass in bin 4
    assert(out(1L).features(76 >> 4) == 1.0f)
    assert(out(1L).lumaSum == 76L * 64 * 48)
    assert(out(2L).decoded && out(2L).width == 20 && out(2L).height == 10)
    assert(math.abs(out(2L).features.sum - 1.0f) < 1e-5)
    assert(out(3L).decoded && out(3L).width == 8 && out(3L).height == 8)
    assert(!out(4L).decoded && out(4L).features.isEmpty,
      "undecodable payload must quarantine, not fail the task")
  }

  test("ImageIO resize: box-bounded, aspect-preserving, output re-decodes") {
    val red = pngBytes(64, 48)((_, _) => 0xFF0000)
    val tiny = pngBytes(5, 4)((_, _) => 0x00FF00)
    val garbage = Array.tabulate[Byte](32)(i => (i * 3).toByte)
    val resized = Multimodal.resizeImages(
      mediaOf((1L, red), (2L, tiny), (3L, garbage)), maxDim = 16)
      .collect().map(r => r.id -> r).toMap
    // 64x48 -> 16x12; re-decode the actual output bytes and check color
    val dec = Multimodal.ImageIoCodec.decode(resized(1L).payload).get
    assert((dec._1, dec._2) == ((16, 12)), s"got ${(dec._1, dec._2)}")
    assert(dec._4(76 >> 4) == 1.0f, "solid red survives bilinear resize")
    assert(resized(1L).meta.format == "png" &&
      resized(1L).meta.sizeBytes == resized(1L).payload.length.toLong)
    // under the box: untouched dims (never upscale)
    val dec2 = Multimodal.ImageIoCodec.decode(resized(2L).payload).get
    assert((dec2._1, dec2._2) == ((5, 4)))
    // garbage passes through unchanged, original metadata intact
    assert(resized(3L).payload.sameElements(garbage))
    assert(resized(3L).meta.sizeBytes == garbage.length.toLong)
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
