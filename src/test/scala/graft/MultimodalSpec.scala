package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRecord

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def media = {
    import spark.implicits._
    Seq(
      MediaRecord(1, "image", Array.tabulate(64)(_.toByte), 8, 8, 0),
      MediaRecord(2, "image", Array.tabulate(128)(i => (i * 3).toByte), 16, 8, 0),
      MediaRecord(3, "audio", Array.tabulate(256)(i => (i % 7).toByte), 0, 0, 16000),
      MediaRecord(4, "video", Array.tabulate(1024)(i => (i % 11).toByte), 32, 24, 0))
      .toDS().repartition(2, org.apache.spark.sql.functions.col("media_id"))
  }

  test("feature extraction is batched, deterministic, fixed-dim") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == 4)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(f => f.feature.forall(x => x >= 0f && x < 1f)))
    // determinism across runs (stub codec is content-addressed)
    assert(f1.map(_.digest).toSeq == f2.map(_.digest).toSeq)
    assert(f1.find(_.media_id == 1).get.n_bytes == 64)
  }

  test("frame sampling explodes one row per frame with stable indices") {
    val frames = Multimodal.sampleFrames(media, framesPer = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(4L).length == 4)
    assert(byId(4L).map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    // frames reassemble a prefix of the payload in order
    val v4 = byId(4L).sortBy(_.frame_idx).flatMap(_.frame_bytes)
    assert(v4.take(16).toSeq ==
      Array.tabulate(1024)(i => (i % 11).toByte).take(16).toSeq)
  }

  test("resize rescales payload and metadata, passes audio through") {
    val resized = Multimodal.resize(media, 4, 4).collect().sortBy(_.media_id)
    val img = resized.find(_.media_id == 1).get
    assert(img.width == 4 && img.height == 4)
    assert(img.payload.length == 64 * (4 * 4) / (8 * 8)) // 16
    val audio = resized.find(_.media_id == 3).get
    assert(audio.payload.length == 256 && audio.sample_rate == 16000)
    // deterministic: same input → same bytes
    val again = Multimodal.resize(media, 4, 4).collect()
      .find(_.media_id == 1).get
    assert(again.payload.toSeq == img.payload.toSeq)
  }

  // --- real-codec variant: javax.imageio (pure JDK) through the same
  // pipeline, proving the MediaCodec seam takes a production decoder --

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def realMedia = {
    import spark.implicits._
    Seq(
      // solid white and solid black 8x8 PNGs — known luminance
      MediaRecord(1, "image", png(8, 8)((_, _) => 0xffffff), 8, 8, 0),
      MediaRecord(2, "image", png(8, 8)((_, _) => 0x000000), 8, 8, 0),
      // left-black/right-white vertical split — asymmetric features
      MediaRecord(3, "image",
        png(16, 8)((x, _) => if (x < 8) 0x000000 else 0xffffff), 16, 8, 0),
      // audio: not an image — must fall back to the stub path
      MediaRecord(4, "audio", Array.tabulate(256)(i => (i % 7).toByte),
        0, 0, 16000))
      .toDS().repartition(2, org.apache.spark.sql.functions.col("media_id"))
  }

  test("imageio codec extracts real pixel features through the pipeline") {
    val f = Multimodal.extractFeatures(realMedia, Multimodal.ImageIoCodec)
      .collect().sortBy(_.media_id)
    val white = f.find(_.media_id == 1).get.feature
    val black = f.find(_.media_id == 2).get.feature
    val split = f.find(_.media_id == 3).get.feature
    assert(white.forall(_ > 0.9f), s"white image: ${white.toSeq}")
    assert(black.forall(_ < 0.1f), s"black image: ${black.toSeq}")
    // 4x4 grid: columns 0-1 over the black half, 2-3 over the white
    assert(split(0) < 0.1f && split(3) > 0.9f, s"split image: ${split.toSeq}")
    // the audio payload is not decodable → deterministic stub features
    val audio = f.find(_.media_id == 4).get.feature
    assert(audio.toSeq == Multimodal.StubCodec
      .extractFeatures(Array.tabulate(256)(i => (i % 7).toByte)).toSeq)
  }

  test("imageio codec resize re-rasters to the exact target dimensions") {
    val resized = Multimodal.resize(realMedia, 4, 4, Multimodal.ImageIoCodec)
      .collect().sortBy(_.media_id)
    val img = resized.find(_.media_id == 3).get
    assert(img.width == 4 && img.height == 4)
    // the resized payload is a real PNG that decodes to 4x4
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(img.payload))
    assert(back != null && back.getWidth == 4 && back.getHeight == 4)
    // audio passes through untouched
    val audio = resized.find(_.media_id == 4).get
    assert(audio.payload.length == 256 && audio.sample_rate == 16000)
  }

  test("metadata stats never touch the payload codec") {
    val stats = Multimodal.metadataStats(media.toDF()).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    val img = stats.find(_.getString(0) == "image").get
    assert(img.getAs[Long]("n") == 2)
    assert(img.getAs[Long]("total_bytes") == 192)
    assert(img.getAs[Int]("max_width") == 16)
  }
}
