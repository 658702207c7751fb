package graft.tools

import org.apache.spark.sql.Dataset

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Throughput probe for the REAL codec paths — evidence that the
  * production decode/hash forms (JDK ImageIO stills, MJPEG frame
  * split + decode, PCM FFT filterbank) are executor-viable at corpus
  * scale, not just correctness-viable in specs. Payloads are REAL
  * encodings (ImageIO-written PNG/JPEG, 16-bit PCM) generated
  * deterministically in executors, persisted, then each hash pass is
  * timed separately from generation.
  *
  * Usage: runMain graft.tools.RealCodecProbe [nImages] [nVideos] [nAudio]
  * Prints one JSON line with per-modality rows/sec; exits 1 if any
  * path quarantined a payload it generated itself (self-integrity). */
object RealCodecProbe {

  private def gray(img: java.awt.image.BufferedImage,
      g: (Int, Int) => Int): java.awt.image.BufferedImage = {
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val v = g(x, y) & 0xFF
        img.setRGB(x, y, v << 16 | v << 8 | v)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encode(fmt: String, w: Int, h: Int,
      g: (Int, Int) => Int): Array[Byte] = {
    val img = gray(new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB), g)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val nImages = if (args.length > 0) args(0).toInt else 20000
    val nVideos = if (args.length > 1) args(1).toInt else 4000
    val nAudio = if (args.length > 2) args(2).toInt else 20000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("real-codec-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def materialize[T](ds: Dataset[T]): Dataset[T] = {
      val p = ds.persist(mem); p.count(); p
    }
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // --- stills: 64x64 PNGs, per-id gradient phase (all distinct)
    val images = materialize(spark.range(nImages).map { i =>
      MediaRow(i, MediaMeta("image", "png", 0L),
        encode("png", 64, 64, (x, y) => (x * 4 + y * 4 + i.toInt) % 256))
    })
    val (imgOk, imgSec) = time {
      Multimodal.dHashImages(images).filter(_.decoded).count()
    }

    // --- videos: 6-frame MJPEG containers of 48x48 JPEGs
    val videos = materialize(spark.range(nVideos).map { i =>
      val frames = (0 until 6).map(f =>
        encode("jpg", 48, 48, (x, y) => (x * 5 + y * 3 + i.toInt + f * 40) % 256))
      MediaRow(i, MediaMeta("video", "mjpeg", 0L),
        frames.reduce(_ ++ _))
    })
    val (vidOk, vidSec) = time {
      Multimodal.dHashVideoFrames(videos).filter(_.decoded).count()
    }

    // --- audio: 16,384-sample 16-bit PCM clips (LCG noise per id)
    val audio = materialize(spark.range(nAudio).map { i =>
      val out = new Array[Byte](16384 * 2)
      var s = i * 6364136223846793005L + 1442695040888963407L
      var k = 0
      while (k < 16384) {
        s = s * 6364136223846793005L + 1442695040888963407L
        val v = (s >>> 48).toShort
        out(2 * k) = (v & 0xFF).toByte
        out(2 * k + 1) = ((v >> 8) & 0xFF).toByte
        k += 1
      }
      MediaRow(i, MediaMeta("audio", "pcm16le", out.length.toLong), out)
    })
    val (audOk, audSec) = time {
      Multimodal.fingerprintAudio(audio).filter(_.decoded).count()
    }

    val ok = imgOk == nImages && vidOk == nVideos.toLong * 6 && audOk == nAudio
    println(
      s"""{"metric":"real_codec_probe","images":$nImages,""" +
        s""""img_hash_sec":${f"$imgSec%.1f"},""" +
        s""""img_per_sec":${(nImages / imgSec).toInt},""" +
        s""""videos":$nVideos,"frames":${nVideos * 6},""" +
        s""""vid_hash_sec":${f"$vidSec%.1f"},""" +
        s""""frames_per_sec":${(nVideos * 6 / vidSec).toInt},""" +
        s""""audio":$nAudio,"aud_fp_sec":${f"$audSec%.1f"},""" +
        s""""aud_per_sec":${(nAudio / audSec).toInt},""" +
        s""""all_decoded":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
