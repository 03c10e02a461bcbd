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

  test("metadata stats never touch the payload codec") {
    val stats = Multimodal.metadataStats(media.toDF()).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    val img = stats.find(_.getString(0) == "image").get
    assert(img.getAs[Long]("n") == 2)
    assert(img.getAs[Long]("total_bytes") == 192)
    assert(img.getAs[Int]("max_width") == 16)
  }
}
