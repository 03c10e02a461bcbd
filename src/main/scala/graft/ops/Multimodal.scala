package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
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
      else Option(ImageIO.read(new ByteArrayInputStream(payload)))

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

  /** Frame sampling: one input video/image row → up to `framesPer`
    * frame rows (flatMap inside the partition, still batched).
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      framesPer: Int = 4,
      codec: MediaCodec = StubCodec): Dataset[Frame] = {
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
}
