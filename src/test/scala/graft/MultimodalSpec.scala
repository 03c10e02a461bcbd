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

  /** 16-bit little-endian mono WAV: sine burst then silence. */
  private def wav(sampleRate: Float, nSamples: Int)
      (sample: Int => Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val s = math.max(-32768,
        math.min(32767, math.round(sample(i) * 32767).toInt))
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("wav codec extracts real RMS features through the pipeline") {
    import spark.implicits._
    // 1600 samples: full-scale sine over the first half, silence after
    val burst = wav(16000f, 1600)(i =>
      if (i < 800) math.sin(2 * math.Pi * i / 32.0) else 0.0)
    val noise = Array.tabulate(256)(i => (i % 7).toByte) // not a WAV
    val ds = Seq(
      MediaRecord(1, "audio", burst, 0, 0, 16000),
      MediaRecord(2, "audio", noise, 0, 0, 16000))
      .toDS().repartition(2, org.apache.spark.sql.functions.col("media_id"))
    val f = Multimodal.extractFeatures(ds, Multimodal.WavCodec)
      .collect().sortBy(_.media_id)
    val feats = f.find(_.media_id == 1).get.feature
    assert(feats.length == 16)
    // sine half: RMS near 1/sqrt(2); silent half: exactly 0
    assert(feats.take(8).forall(v => v > 0.6f && v < 0.8f),
      s"sine segments: ${feats.toSeq}")
    assert(feats.drop(8).forall(_ == 0f), s"silent segments: ${feats.toSeq}")
    // non-WAV payload falls back to the deterministic stub
    assert(f.find(_.media_id == 2).get.feature.toSeq ==
      Multimodal.StubCodec.extractFeatures(noise).toSeq)
  }

  test("wav codec samples frame-aligned PCM clips") {
    val burst = wav(8000f, 800)(i => math.sin(2 * math.Pi * i / 16.0))
    val clips = Multimodal.WavCodec.sampleFrames(burst, 4)
    assert(clips.length == 4)
    // each clip is 200 samples of 16-bit mono = 400 bytes
    assert(clips.forall(_.length == 400), clips.map(_.length).toSeq)
    // clip energy is real signal, not header bytes: nonzero samples
    assert(clips.head.exists(_ != 0))
    // non-WAV falls back to the stub's contiguous chunks
    val noise = Array.tabulate(64)(i => (i * 3).toByte)
    assert(Multimodal.WavCodec.sampleFrames(noise, 4).map(_.toSeq) ==
      Multimodal.StubCodec.sampleFrames(noise, 4).map(_.toSeq))
  }

  test("metadata stats never touch the payload codec") {
    val stats = Multimodal.metadataStats(media.toDF()).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    val img = stats.find(_.getString(0) == "image").get
    assert(img.getAs[Long]("n") == 2)
    assert(img.getAs[Long]("total_bytes") == 192)
    assert(img.getAs[Int]("max_width") == 16)
  }

  test("featureFingerprint equals the integer above-mean hash of the digest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val payloads = Seq((1L, "hello world"), (2L, "abc"))
    val media = payloads.map { case (id, s) =>
      MediaRecord(id, "image", s.getBytes("UTF-8"), 8, 8, 0)
    }.toDS()
    val got = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"),
        Multimodal.featureFingerprint(col("feature"), 16).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.foreach { case (id, s) =>
      val bytes = Multimodal.StubCodec.digest(s.getBytes("UTF-8"))
        .map(_ & 0xff)
      val total = bytes.sum
      val expected = bytes.zipWithIndex
        .collect { case (b, i) if 16 * b > total => 1L << i }.sum
      assert(got(id) == expected, s"fingerprint of payload $id")
    }
  }

  test("real-codec near-dup: perturbed image pairs, distinct image does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A and A': half-dark/half-bright with a one-pixel tweak — the
    // above-mean grid bits are identical or off by ≤1; B inverts the
    // pattern — far in Hamming space
    val base = (x: Int, _: Int) => if (x < 8) 0x202020 else 0xe0e0e0
    val media = Seq(
      MediaRecord(1, "image", png(16, 16)(base), 16, 16, 0),
      MediaRecord(2, "image", png(16, 16)((x, y) =>
        if (x == 0 && y == 0) 0x303030 else base(x, y)), 16, 16, 0),
      MediaRecord(3, "image", png(16, 16)((x, _) =>
        if (x < 8) 0xe0e0e0 else 0x202020), 16, 16, 0)
    ).toDS()
    val withFp = Multimodal.extractFeatures(media, Multimodal.ImageIoCodec)
      .toDF().select(col("media_id"),
        Multimodal.featureFingerprint(col("feature"), 16).as("fp"))
    val pairs = Multimodal.nearDupPairs(withFp, "media_id", "fp",
      nBands = 2, bandBits = 8, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"pairs: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"pairs: $pairs")
  }

  test("banded candidates lose no pair within the Hamming budget") {
    import spark.implicits._
    // exhaustive check: every fp pair with ham <= 1 must surface —
    // the pigeonhole guarantee (2 bands, budget 1)
    val fps = Seq(0x00ffL, 0x00feL, 0x80ffL, 0x1234L, 0x1235L, 0xffffL)
      .zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
    val withFp = fps.toDF("media_id", "fp")
    val got = Multimodal.nearDupPairs(withFp, "media_id", "fp",
      nBands = 2, bandBits = 8, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      ham = java.lang.Long.bitCount(fa ^ fb) if ham <= 1
    } yield (a, b, ham)).toSet
    assert(got == want)
  }

  test("sampleStats: exact u8-PCM deviation stats, empty payload drops") {
    import spark.implicits._
    // bytes 120..135 → devs −8..7 all within the quiet fence; byte 0
    // → dev −128 (the unsigned-read edge); byte 255 → dev 127
    val clips = Seq(
      MediaRecord(1, "audio", Array.tabulate(16)(i => (120 + i).toByte),
        0, 0, 16000),
      MediaRecord(2, "audio", Array[Byte](0, -1), 0, 0, 16000), // 0x00,0xff
      MediaRecord(3, "audio", Array.empty[Byte], 0, 0, 16000)
    ).toDS()
    val got = Multimodal.sampleStats(clips).collect()
      .map(s => s.media_id -> s).toMap
    assert(!got.contains(3L)) // no samples → no row
    val s1 = got(1L)
    assert(s1.n_samples == 16 && s1.n_quiet == 16 && s1.peak == 8)
    assert(s1.dev2_sum == (-8 to 7).map(v => v * v).sum)
    val s2 = got(2L)
    assert(s2.n_samples == 2 && s2.n_quiet == 0 && s2.peak == 128)
    assert(s2.dev2_sum == 128L * 128 + 127L * 127)
  }
}
