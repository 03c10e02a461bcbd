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
  * The actual codec work (JPEG decode, audio resample, frame extract)
  * needs native libraries that are NOT in this environment — those
  * steps are STUBBED behind [[StubCodec]] with deterministic fakes.
  * Everything Spark-side — schema, batching, partitioning, output
  * shapes — is real and tested; swapping a real codec in changes one
  * function.
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

  /** STUB: stands in for a real decoder (libjpeg / ffmpeg / soundfile).
    * Deterministic: features derive from an MD5 sketch of the payload,
    * so tests are stable and the pipeline shape is exercised for real.
    */
  object StubCodec {
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

  /** Batched feature extraction over the binary column. Partition count
    * is preserved — upstream `repartition(k, col("media_id"))` controls
    * parallelism/batch size exactly like `mapInPandas` batches.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        MediaFeatures(
          media_id = m.media_id,
          kind = m.kind,
          n_bytes = m.payload.length.toLong,
          digest = StubCodec.digest(m.payload).map("%02x".format(_)).mkString,
          feature = StubCodec.extractFeatures(m.payload))
      }
    }
  }

  /** Batched resize of image/video payloads to exact target
    * dimensions; metadata columns updated alongside the payload (audio
    * rows pass through).
    */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    require(targetW > 0 && targetH > 0,
      s"target dimensions must be positive: ${targetW}x$targetH")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        if (m.kind == "audio" || m.width <= 0 || m.height <= 0) m
        else m.copy(
          payload = StubCodec.resize(m.payload, m.width, m.height, targetW, targetH),
          width = targetW, height = targetH)
      }
    }
  }

  /** Frame sampling: one input video/image row → up to `framesPer`
    * frame rows (flatMap inside the partition, still batched).
    */
  def sampleFrames(media: Dataset[MediaRecord], framesPer: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        StubCodec.sampleFrames(m.payload, framesPer).zipWithIndex.map {
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
