package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata, and per-record compute
  * runs batched inside `mapPartitions` (the JVM analogue of a
  * vectorized pandas UDF: one iterator per partition, no per-row
  * serialization overhead, executor-parallel).
  *
  * Codec work goes through the [[MediaCodec]] seam. [[ImageIoCodec]]
  * is a real JDK-only image decoder (javax.imageio: decode, pixel
  * features, raster resize); audio/video decode needs native libraries
  * NOT in this environment, so those paths keep the deterministic
  * [[StubCodec]] fakes. Everything Spark-side — schema, batching,
  * partitioning, output shapes — is real and tested with both codecs.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, // images/video; 0 otherwise
      height: Int,
      sample_rate: Int) // audio; 0 otherwise

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      digest: String,
      feature: Array[Float]) // fixed-dim embedding-shaped vector

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  final case class SampleStats(
      media_id: Long,
      n_samples: Long,
      n_quiet: Long,
      dev2_sum: Long,
      peak: Int)

  /** The codec seam: everything that needs to crack a payload goes
    * through one of these. Implementations must be serializable — they
    * ship to executors inside the `mapPartitions` closures.
    */
  trait MediaCodec extends Serializable {
    def extractFeatures(payload: Array[Byte]): Array[Float]
    def resize(payload: Array[Byte], srcW: Int, srcH: Int,
        targetW: Int, targetH: Int): Array[Byte]
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** STUB: stands in for a real decoder (libjpeg / ffmpeg / soundfile).
    * Deterministic: features derive from an MD5 sketch of the payload,
    * so tests are stable and the pipeline shape is exercised for real.
    */
  object StubCodec extends MediaCodec {
    def digest(bytes: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("MD5").digest(bytes)

    /** 16-dim deterministic fake feature vector in [0, 1). */
    def extractFeatures(payload: Array[Byte]): Array[Float] = {
      val d = digest(payload)
      Array.tabulate(16)(i => ((d(i % d.length) & 0xff) / 256.0f))
    }

    /** Fake resize: deterministic byte-space resample to *exactly*
      * targetW×targetH pixels (no aspect-ratio fitting — callers that
      * want fit-within compute the box themselves). Output length
      * scales with the pixel ratio so Spark-side size accounting
      * behaves like a real resize. All length math is in Long and
      * checked: a result that cannot fit an array is an error, not a
      * silent wrap.
      */
    def resize(payload: Array[Byte], srcW: Int, srcH: Int,
        targetW: Int, targetH: Int): Array[Byte] = {
      require(targetW > 0 && targetH > 0,
        s"target dimensions must be positive: ${targetW}x$targetH")
      if (payload.isEmpty || srcW <= 0 || srcH <= 0) return Array.empty
      val targetLenL = math.max(1L,
        payload.length.toLong * (targetW.toLong * targetH) /
          math.max(1L, srcW.toLong * srcH))
      val targetLen = Math.toIntExact(targetLenL) // throws on overflow
      Array.tabulate(targetLen) { i =>
        payload(((i.toLong * payload.length) / targetLen).toInt)
      }
    }

    /** Fake frame sampling: split payload into `n` contiguous chunks
      * (a real implementation would seek keyframes).
      */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty) return Seq.empty
      val step = math.max(1, payload.length / n)
      (0 until math.min(n, payload.length))
        .map(i => payload.slice(i * step, math.min((i + 1) * step, payload.length)))
        .filter(_.nonEmpty)
    }
  }

  /** Real image decoder on top of `javax.imageio` — pure JDK, no
    * native libraries. Payloads that decode as images (PNG/BMP/GIF/
    * JPEG per the JDK's registered readers) get real pixel features
    * and a real raster resize; anything ImageIO cannot read (audio,
    * video, opaque blobs) falls back to the deterministic stub, so one
    * codec serves a mixed-modality table. This is the proof that the
    * seam takes a production decoder: swapping ffmpeg/soundfile in
    * later changes this object only.
    */
  object ImageIoCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    private def decode(payload: Array[Byte]): Option[BufferedImage] =
      if (payload.isEmpty) None
      // catch, don't just null-check: a TRUNCATED image (valid magic
      // bytes, cut-off body) makes ImageIO pick a reader that then
      // THROWS from read() — per the contract above, anything that
      // cannot decode falls back to the stub instead of crashing the
      // task (WavCodec.decodePcm does the same)
      else try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** 16-dim feature: mean luminance of a 4×4 grid over the decoded
      * raster, each in [0, 1) — a real (if tiny) visual embedding.
      */
    def extractFeatures(payload: Array[Byte]): Array[Float] =
      decode(payload) match {
        case None => StubCodec.extractFeatures(payload)
        case Some(img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = new Array[Double](16)
          val counts = new Array[Long](16)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val cell = math.min(3, y * 4 / h) * 4 + math.min(3, x * 4 / w)
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299L +
                ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L) / 1000.0
              sums(cell) += lum
              counts(cell) += 1
              x += 1
            }
            y += 1
          }
          Array.tabulate(16)(i =>
            if (counts(i) == 0) 0f else (sums(i) / counts(i) / 256.0).toFloat)
      }

    /** Raster resize to exactly targetW×targetH, re-encoded as PNG
      * (lossless, deterministic bytes for a given raster).
      */
    def resize(payload: Array[Byte], srcW: Int, srcH: Int,
        targetW: Int, targetH: Int): Array[Byte] = {
      require(targetW > 0 && targetH > 0,
        s"target dimensions must be positive: ${targetW}x$targetH")
      decode(payload) match {
        case None => StubCodec.resize(payload, srcW, srcH, targetW, targetH)
        case Some(img) =>
          val out = new BufferedImage(targetW, targetH,
            BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, targetW, targetH, null)
          finally g.dispose()
          val bytes = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bytes)
          bytes.toByteArray
      }
    }

    /** Frame extraction needs a container demuxer (ffmpeg) — still the
      * stub's contiguous-chunk fake for every payload.
      */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] =
      StubCodec.sampleFrames(payload, n)
  }

  /** Real audio decoder on top of `javax.sound.sampled` — pure JDK, no
    * native libraries (the WAV/PCM counterpart of [[ImageIoCodec]]).
    * Payloads that parse as WAV (or any format the JDK's registered
    * readers handle) get real acoustic features and real frame-aligned
    * clip sampling; anything unparseable (images, video, opaque blobs)
    * falls back to the deterministic stub, so one codec serves a
    * mixed-modality table. Compressed formats (mp3/ogg) would need an
    * SPI on the classpath — the seam takes one without code changes.
    */
  object WavCodec extends MediaCodec {
    import java.io.ByteArrayInputStream
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    /** Payload → (mono samples in [-1, 1], sample rate), None if the
      * JDK cannot parse it. 8/16-bit PCM both supported; channels are
      * averaged to mono.
      */
    private[ops] def decodePcm(
        payload: Array[Byte]): Option[(Array[Double], Float)] = {
      if (payload.isEmpty) return None
      try {
        val in = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val pcm =
            if (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED) in
            else AudioSystem.getAudioInputStream(
              AudioFormat.Encoding.PCM_SIGNED, in)
          val f = pcm.getFormat
          val bytes = pcm.readAllBytes()
          val bytesPerSample = f.getSampleSizeInBits / 8
          if (bytesPerSample < 1 || bytesPerSample > 2) return None
          val channels = f.getChannels
          val frameBytes = bytesPerSample * channels
          val nFrames = bytes.length / frameBytes
          val mono = new Array[Double](nFrames)
          var i = 0
          while (i < nFrames) {
            var acc = 0.0
            var c = 0
            while (c < channels) {
              val off = i * frameBytes + c * bytesPerSample
              acc += (if (bytesPerSample == 2) {
                val lo = bytes(off + (if (f.isBigEndian) 1 else 0)) & 0xff
                val hi = bytes(off + (if (f.isBigEndian) 0 else 1)) & 0xff
                val u = (hi << 8) | lo
                // unsigned 16-bit sits on a 32768 midpoint, not 0 — a
                // signed reinterpretation would invert the waveform
                if (f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
                  (u - 32768) / 32768.0
                else u.toShort / 32768.0
              } else if (f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
                ((bytes(off) & 0xff) - 128) / 128.0
              else bytes(off) / 128.0)
              c += 1
            }
            mono(i) = acc / channels
            i += 1
          }
          Some((mono, f.getSampleRate))
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    }

    /** 16-dim feature: RMS energy of 16 equal time segments, each in
      * [0, 1] — the audio analogue of ImageIoCodec's luminance grid.
      */
    def extractFeatures(payload: Array[Byte]): Array[Float] =
      decodePcm(payload) match {
        case None => StubCodec.extractFeatures(payload)
        case Some((samples, _)) =>
          if (samples.isEmpty) return new Array[Float](16)
          val sums = new Array[Double](16)
          val counts = new Array[Long](16)
          var i = 0
          while (i < samples.length) {
            val seg = math.min(15, (i.toLong * 16 / samples.length).toInt)
            sums(seg) += samples(i) * samples(i)
            counts(seg) += 1
            i += 1
          }
          Array.tabulate(16)(s =>
            if (counts(s) == 0) 0f else math.sqrt(sums(s) / counts(s)).toFloat)
      }

    /** Raster resize is meaningless for audio; time-domain resampling
      * is a sample-rate conversion, not a W×H operation — and audio
      * rows never reach [[Multimodal.resize]]'s codec call anyway
      * (kind == "audio" passes through). Stub for non-audio payloads.
      */
    def resize(payload: Array[Byte], srcW: Int, srcH: Int,
        targetW: Int, targetH: Int): Array[Byte] =
      StubCodec.resize(payload, srcW, srcH, targetW, targetH)

    /** Real clip sampling: `n` contiguous equal spans of the decoded
      * PCM data, re-emitted as raw 16-bit little-endian mono — frame
      * boundaries respected by construction (2 bytes per sample).
      */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] =
      decodePcm(payload) match {
        case None => StubCodec.sampleFrames(payload, n)
        case Some((samples, _)) =>
          if (samples.isEmpty || n <= 0) return Seq.empty
          val per = math.max(1, samples.length / n)
          (0 until math.min(n, samples.length)).map { i =>
            val clip = samples.slice(i * per,
              math.min((i + 1) * per, samples.length))
            val out = new Array[Byte](clip.length * 2)
            var j = 0
            while (j < clip.length) {
              val s = math.max(-32768, math.min(32767,
                math.round(clip(j) * 32767).toInt))
              out(2 * j) = (s & 0xff).toByte
              out(2 * j + 1) = ((s >> 8) & 0xff).toByte
              j += 1
            }
            out
          }.filter(_.nonEmpty)
      }
  }

  /** Container-aware video codec on top of [[Mp4]] — the third real
    * seam implementation beside [[ImageIoCodec]] and [[WavCodec]]:
    * payloads that parse as ISO-BMFF get REAL sample extraction
    * (`stsz`/`stco` locate each sample's exact byte range in `mdat` —
    * no decode needed to slice true sample bytes); anything else falls
    * back to the deterministic stub. Pixel DECODE of those samples
    * still needs a native codec (no pure-JDK H.264/HEVC), so features
    * and resize stay stub-backed — the documented residual.
    */
  object Mp4Codec extends MediaCodec {
    def extractFeatures(payload: Array[Byte]): Array[Float] =
      StubCodec.extractFeatures(payload)

    def resize(payload: Array[Byte], srcW: Int, srcH: Int,
        targetW: Int, targetH: Int): Array[Byte] =
      StubCodec.resize(payload, srcW, srcH, targetW, targetH)

    /** The first `n` container samples, byte-true, empties dropped
      * (zero-size samples are legal in `stsz`; they count toward the
      * n-window — the limit caps the COPY work, so a payload with
      * thousands of samples never pays a full-mdat copy for frames it
      * discards). Stub split for non-BMFF payloads.
      */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val real = Mp4.samples(payload, limit = n)
      if (real.isEmpty) StubCodec.sampleFrames(payload, n)
      else real.filter(_.nonEmpty)
    }
  }

  final case class ContainerMeta(
      media_id: Long,
      is_mp4: Boolean,
      brand: String,
      timescale: Long,
      duration_ticks: Long,
      duration_ms: Long,
      n_tracks: Int,
      handler: String,
      codec: String,
      width: Int,
      height: Int,
      n_samples: Long,
      media_bytes: Long)

  /** Container metadata for video payloads — the no-decode fast path
    * ([[metadataStats]]'s rule) made REAL for MP4: duration, track
    * count, codec fourcc, presentation size and exact media-byte
    * accounting, parsed from the box tree inside `mapPartitions`
    * (batched, partition count preserved). Non-BMFF payloads emit an
    * `is_mp4 = false` row with zeroed fields rather than vanishing —
    * a curation filter needs to COUNT the undecodable, not skip it.
    */
  def containerMeta(media: Dataset[MediaRecord]): Dataset[ContainerMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        Mp4.parse(m.payload) match {
          case Some(info) =>
            val t = info.tracks.headOption
            ContainerMeta(m.media_id, is_mp4 = true, info.brand,
              info.timescale, info.durationTicks, info.durationMs,
              info.tracks.length,
              t.map(_.handler).getOrElse(""),
              t.map(_.codec).getOrElse(""),
              t.map(_.width).getOrElse(0), t.map(_.height).getOrElse(0),
              t.map(_.sampleSizes.length.toLong).getOrElse(0L),
              info.mediaBytes)
          case None =>
            ContainerMeta(m.media_id, is_mp4 = false, "", 0L, 0L, 0L,
              0, "", "", 0, 0, 0L,
              if (m.payload == null) 0L else m.payload.length.toLong)
        }
      }
    }
  }

  /** Batched feature extraction over the binary column. Partition count
    * is preserved — upstream `repartition(k, col("media_id"))` controls
    * parallelism/batch size exactly like `mapInPandas` batches.
    */
  def extractFeatures(
      media: Dataset[MediaRecord],
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        MediaFeatures(
          media_id = m.media_id,
          kind = m.kind,
          n_bytes = m.payload.length.toLong,
          digest = StubCodec.digest(m.payload).map("%02x".format(_)).mkString,
          feature = codec.extractFeatures(m.payload))
      }
    }
  }

  /** Batched resize of image/video payloads to exact target
    * dimensions; metadata columns updated alongside the payload (audio
    * rows pass through).
    */
  def resize(
      media: Dataset[MediaRecord],
      targetW: Int,
      targetH: Int,
      codec: MediaCodec = StubCodec): Dataset[MediaRecord] = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive: ${targetW}x$targetH")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        if (m.kind == "audio" || m.width <= 0 || m.height <= 0) m
        else m.copy(
          payload = codec.resize(m.payload, m.width, m.height, targetW, targetH),
          width = targetW, height = targetH)
      }
    }
  }

  /** Per-clip loudness/silence statistics over audio payload bytes
    * read as unsigned 8-bit PCM samples centered at 128: sample
    * count, quiet-sample count (|sample − 128| ≤ `quietDev`), exact
    * squared-deviation sum (the RMS numerator, integer — never a
    * float accumulation), and peak deviation. The audio twin of the
    * image aHash path: silence-ratio/clipping gates run BEFORE any
    * expensive transcription at 100 TB. A real pipeline decodes
    * compressed audio through the [[MediaCodec]] seam first; raw
    * PCM-as-bytes is the stub-grade interpretation the oracle can
    * reproduce byte-for-byte. Empty payloads emit nothing (no
    * samples → no stats row). Batched mapPartitions, partition count
    * preserved, one pass per payload.
    */
  def sampleStats(
      media: Dataset[MediaRecord],
      quietDev: Int = 16): Dataset[SampleStats] = {
    require(quietDev >= 0, s"quietDev must be >= 0, got $quietDev")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        val p = m.payload
        if (p == null || p.isEmpty) Iterator.empty
        else {
          var i = 0
          var quiet = 0L
          var dev2 = 0L
          var peak = 0
          while (i < p.length) {
            val v = (p(i) & 0xff) - 128
            val a = if (v < 0) -v else v
            if (a <= quietDev) quiet += 1
            dev2 += v.toLong * v
            if (a > peak) peak = a
            i += 1
          }
          Iterator.single(
            SampleStats(m.media_id, p.length.toLong, quiet, dev2, peak))
        }
      }
    }
  }

  /** Per-sample explode over the PCM seam: (media_id, i, dev, n) with
    * i 0-based and dev = u8 sample − 128 — the row shape DSP-flavored
    * SQL (windowed energies, fixed-frequency probes) aggregates over.
    * Decode happens once inside the partition; everything above it is
    * columnar. Fan-out is |payload| rows per clip — bounded by clip
    * length, and the downstream aggregates are all map-side partial.
    */
  def samples(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    // spread BEFORE the |payload|-per-clip fan-out: a few-file source
    // otherwise funnels the whole sample frame through its file count
    media.repartition(ScaleOps.fanoutWidth(media.toDF()))
      .mapPartitions { batch =>
        batch.flatMap { m =>
          val p = m.payload
          if (p == null || p.isEmpty) Iterator.empty
          else p.iterator.zipWithIndex.map { case (b, i) =>
            (m.media_id, i.toLong, (b & 0xff) - 128, p.length.toLong)
          }
        }
      }.toDF("media_id", "i", "dev", "n")
  }

  /** Frame sampling: one input video/image row → up to `framesPer`
    * frame rows (flatMap inside the partition, still batched).
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      framesPer: Int = 4,
      codec: MediaCodec = StubCodec): Dataset[Frame] = {
    // fail at the API edge: framesPer=0 reached the stub codec's
    // payload.length / n as an executor-side ArithmeticException
    require(framesPer >= 1, s"framesPer must be >= 1, got $framesPer")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        codec.sampleFrames(m.payload, framesPer).zipWithIndex.map {
          case (bytes, i) => Frame(m.media_id, i, bytes)
        }
      }
    }
  }

  /** Metadata-level stats need no decode at all — pure columnar ops
    * that stay in whole-stage codegen (this is the path that must win
    * at 100 TB: never crack the payload when the question is answerable
    * from metadata).
    */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("sample_rate")).as("max_sample_rate"))
      .orderBy("kind")

  /** Above-mean feature fingerprint — the "aHash" pattern lifted onto
    * the codec seam: bit i is set iff feature_i · dims > Σ features.
    * Works for ANY codec's fixed-dim features (real 4×4 luminance
    * grids from [[ImageIoCodec]] give a classic perceptual hash; the
    * stub's md5-byte features stay integer-exact for the oracle:
    * (b/256)·16 > Σb/256 ⟺ 16·b > Σb — every float in the compare is
    * an exact multiple of 2⁻⁸, so the float path and the oracle's
    * integer path decide identically). The two HOFs run interpreted —
    * over `dims` elements per row, not a scan-width hot path; the
    * variable-distance shift goes through `call_function` (the typed
    * `shiftleft` takes only a literal distance).
    */
  def featureFingerprint(featCol: Column, dims: Int): Column = {
    val total = aggregate(featCol, lit(0.0d),
      (acc, x) => acc + x.cast("double"))
    aggregate(
      transform(featCol, (x, i) =>
        when(x.cast("double") * lit(dims.toDouble) > total,
          call_function("shiftleft", lit(1L), i.cast("int")))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Banded Hamming near-dup join over feature fingerprints — the
    * image-dedup shape: nBands bit-slices index the candidate join
    * (pigeonhole: ham ≤ nBands−1 guarantees a shared band, hence the
    * maxHamming < nBands requirement — no candidate is missed), then
    * the exact `bit_count(xor)` verify keeps true near-dups. Same LSH
    * geometry as [[TextDedup.simhashPairs]], applied to the multimodal
    * seam; candidates are band-bucket-local, never all-pairs.
    * Fingerprint width is the codec's feature dim count — real
    * deployments widen dims (64-dim grid → 64-bit fp) to thin the
    * buckets rather than raising the band count.
    */
  def nearDupPairs(
      withFp: DataFrame,
      idCol: String,
      fpCol: String,
      nBands: Int = 2,
      bandBits: Int = 8,
      maxHamming: Int = 1,
      handle: CacheHandle = null): DataFrame = {
    require(nBands >= 1 && bandBits >= 1, "need nBands, bandBits >= 1")
    require(maxHamming < nBands,
      s"pigeonhole needs maxHamming < nBands, got $maxHamming/$nBands")
    val mask = (1L << bandBits) - 1
    val banded = CacheHandle.persistWith(handle,
      withFp.select(col(idCol), col(fpCol),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band_idx"),
            shiftright(col(fpCol), b * bandBits).bitwiseAND(lit(mask))
              .as("band_val"))): _*)).as("bd"))
        .select(col(idCol), col(fpCol),
          col("bd.band_idx"), col("bd.band_val")))
    val x = banded.select(col(idCol).as("a"), col(fpCol).as("fpa"),
      col("band_idx"), col("band_val"))
    val y = banded.select(col(idCol).as("b"), col(fpCol).as("fpb"),
      col("band_idx"), col("band_val"))
    x.join(y, Seq("band_idx", "band_val"))
      .filter(col("a") < col("b"))
      .select("a", "b", "fpa", "fpb").distinct()
      .select(col("a"), col("b"),
        bit_count(col("fpa").bitwiseXOR(col("fpb"))).as("ham"))
      .filter(col("ham") <= maxHamming)
  }
}
