package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal

/** Declared queries for the multimodal-column plumbing — these drive
  * the REAL pipeline (typed `Dataset[MediaRecord]`, batched
  * `mapPartitions` feature extraction, metadata fast path) through the
  * driver's oracle gate.
  *
  * The media table is derived deterministically from `documents`: the
  * payload is the text's UTF-8 bytes and the modality cycles by
  * doc_id. That keeps the oracle exact: the stub codec's features are
  * md5-derived bytes over 256, so the feature sum ×256 is an INTEGER
  * both engines compute identically — the oracle checks the full
  * decode→feature path without ever hashing a float.
  *
  * Scale stance: feature extraction is executor-parallel batches
  * (partition count preserved, no per-row ser/de); the metadata query
  * never cracks a payload (pure codegen'd columnar aggregation).
  */
object MediaQueries {

  /** documents → deterministic MediaRecord columns (modality cycles
    * image/audio/video by doc_id; dimensions fixed per modality).
    *
    * Repartitioned at the source: documents.parquet is ONE file at
    * every sf, so without it every mapPartitions decode pipeline
    * downstream (features/frames/resize/loudness/neardup) ran in ONE
    * task — zero decode parallelism, contradicting the module's scale
    * stance (the CLAUDE.md single-file-source rule; Multimodal.samples
    * already did this for the spectrum gate).
    */
  private def media(s: SparkSession, dir: String): DataFrame = {
    val kind = when(pmod(col("doc_id"), lit(3)) === 0, "image")
      .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
      .otherwise("video")
    Tables.table(s, dir, "documents")
      .repartition(graft.ops.ScaleOps.fanoutWidth(
        Tables.table(s, dir, "documents")))
      .select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      when(kind =!= "audio", lit(32)).otherwise(lit(0)).as("width"),
      when(kind =!= "audio", lit(24)).otherwise(lit(0)).as("height"),
      when(kind === "audio", lit(16000)).otherwise(lit(0))
        .as("sample_rate"))
  }

  /** Video documents wrapped in REAL deterministic MP4 containers
    * ([[graft.ops.Mp4.build]]): every container field is a pure
    * function of (doc_id, text byte length), so the DuckDB oracle
    * reproduces the expected metadata from the GENERATING formulas
    * while the Spark side recovers it by PARSING the box tree on
    * executors — a writer or parser bug on either side breaks the
    * hash. Same single-file-source repartition as [[media]].
    */
  private def mp4media(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
    import s.implicits._
    Tables.table(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .repartition(graft.ops.ScaleOps.fanoutWidth(
        Tables.table(s, dir, "documents")))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val data = Option(text).getOrElse("").getBytes("UTF-8")
          val len = data.length
          val base = len / 4
          val rem = len % 4
          val w = (160 * (1 + id % 4)).toInt
          val h = (90 * (1 + id % 4)).toInt
          val payload = graft.ops.Mp4.build(
            data,
            timescale = (600 + (id % 5) * 120).toInt,
            durationTicks = len.toLong * 50 + (id % 7) * 3,
            codec = ((id / 3) % 3) match {
              case 0 => "avc1"; case 1 => "hev1"; case _ => "vp09"
            },
            width = w, height = h,
            sampleSizes = (0 until 4).map(i =>
              base + (if (i < rem) 1 else 0)))
          Multimodal.MediaRecord(id, "video", payload, w, h, 0)
        }
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MP4 container metadata through the box-walking parser
    // (Multimodal.containerMeta): duration/timescale/codec/dims/
    // sample accounting recovered from REAL container bytes inside
    // mapPartitions; the oracle recomputes each field from mp4media's
    // generating formulas — parse ∘ build must be the identity.
    "q_media_mp4_meta" -> ((s, dir) =>
      Multimodal.containerMeta(mp4media(s, dir)).toDF()
        .select(col("media_id"), col("brand"), col("timescale"),
          col("duration_ticks"), col("duration_ms"), col("n_tracks"),
          col("handler"), col("codec"), col("width"), col("height"),
          col("n_samples"), col("media_bytes"))
        .orderBy("media_id")),

    // Container-aware frame sampling (Mp4Codec): stsz/stco locate
    // each sample's exact byte range in mdat — the emitted frames are
    // byte-true slices of the original text, which the oracle slices
    // back out of the hex string with the same base/rem arithmetic.
    "q_media_mp4_frames" -> ((s, dir) => {
      import s.implicits._
      Multimodal.sampleFrames(mp4media(s, dir), framesPer = 4,
        codec = Multimodal.Mp4Codec).toDF()
        .select(col("media_id"), col("frame_idx"),
          length(col("frame_bytes")).as("n_frame_bytes"),
          md5(hex(col("frame_bytes"))).as("frame_md5"))
        .orderBy("media_id", "frame_idx")
    }),


    // Batched feature extraction through the MediaCodec seam: payload
    // → digest + 16-dim feature vector inside mapPartitions. The
    // declared columns stay integer-exact: feat_sum_x256 is the
    // feature-vector sum scaled back to the md5-byte domain.
    "q_media_features" -> ((s, dir) => {
      import s.implicits._
      val feats = Multimodal.extractFeatures(
        media(s, dir).as[Multimodal.MediaRecord])
      feats.toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("digest"),
          (aggregate(col("feature"), lit(0.0d), (acc, x) => acc + x)
            * 256).cast("long").as("feat_sum_x256"))
        .orderBy("media_id")
    }),

    // Frame sampling: one media row → up to 4 frame rows, flatMapped
    // inside the partition batch. Frames are compared byte-exactly via
    // hex (DuckDB 1.0 has no BLOB substring; hex strings slice the
    // same bytes on both engines, multibyte text included).
    "q_media_frames" -> ((s, dir) => {
      import s.implicits._
      val frames = Multimodal.sampleFrames(
        media(s, dir).as[Multimodal.MediaRecord], framesPer = 4)
      frames.toDF()
        .select(col("media_id"), col("frame_idx"),
          length(col("frame_bytes")).as("n_frame_bytes"),
          md5(hex(col("frame_bytes"))).as("frame_md5"))
        .orderBy("media_id", "frame_idx")
    }),

    // Batched resize: image/video payloads resampled to 16×12 (the
    // stub's deterministic byte-space resample; audio passes through),
    // compared byte-exactly via hex like q_media_frames.
    "q_media_resize" -> ((s, dir) => {
      import s.implicits._
      val resized = Multimodal.resize(
        media(s, dir).as[Multimodal.MediaRecord], targetW = 16, targetH = 12)
      resized.toDF()
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          md5(hex(col("payload"))).as("payload_md5"))
        .orderBy("media_id")
    }),

    // Metadata fast path: per-modality stats with no payload decode —
    // the query shape that must win at 100 TB.
    "q_media_meta" -> ((s, dir) =>
      Multimodal.metadataStats(media(s, dir))
        .withColumn("total_bytes", col("total_bytes").cast("long"))),

    // Audio loudness/silence gate (Multimodal.sampleStats): payload
    // bytes as u8 PCM samples — quiet-sample ratio, exact integer
    // squared-deviation sum, peak deviation. The cheap pre-filter a
    // speech pipeline runs before transcription; integer-exact so
    // the oracle replays it from hex byte slices.
    "q_media_loudness" -> ((s, dir) => {
      import s.implicits._
      val stats = Multimodal.sampleStats(
        media(s, dir).filter(col("kind") === "audio")
          .as[Multimodal.MediaRecord])
      stats.toDF()
        .select(col("media_id"), col("n_samples"), col("n_quiet"),
          col("dev2_sum"), col("peak"),
          round(col("n_quiet").cast("double") / col("n_samples"), 6)
            .as("quiet_ratio_r"))
        .orderBy("media_id")
    }),

    // Fixed-frequency spectral probe (Goertzel-style single-bin DFT
    // energies at k = 1..3 cycles per clip) over the PCM seam — the
    // tone/hum detector a speech pipeline runs before transcription.
    // Cross-engine determinism: the angle is built with ONE shared
    // association ((2π)·(k·i))/n from exact-integer doubles, each
    // dev·cos term crosses the aggregate as DECIMAL(28,14)
    // (order-independent; a 1-ulp libm cos difference shifts the sum
    // by ≤ n·1e-14, far inside the round(…,6) gate), and the energy
    // normalization mirrors the oracle's parenthesization exactly.
    "q_media_spectrum" -> ((s, dir) => {
      import s.implicits._
      val sm = graft.ops.Multimodal.samples(
        media(s, dir).filter(col("kind") === "audio")
          .as[graft.ops.Multimodal.MediaRecord])
      val aggs = Seq(1, 2, 3).flatMap { k =>
        val ang = (lit(2.0 * math.Pi) *
          (lit(k.toDouble) * col("i").cast("double"))) /
          col("n").cast("double")
        Seq(
          sum((col("dev").cast("double") * cos(ang))
            .cast("decimal(28,14)")).as(s"c$k"),
          sum((col("dev").cast("double") * sin(ang))
            .cast("decimal(28,14)")).as(s"s$k"))
      }
      val nn = col("n").cast("double") * col("n").cast("double")
      sm.groupBy("media_id", "n").agg(aggs.head, aggs.tail: _*)
        .select(col("media_id") +: col("n").as("n_samples") +:
          Seq(1, 2, 3).map { k =>
            round((col(s"c$k").cast("double") * col(s"c$k").cast("double") +
              col(s"s$k").cast("double") * col(s"s$k").cast("double")) / nn,
              6).as(s"e${k}_r")
          }: _*)
        .orderBy("media_id")
    }),

    // Feature-fingerprint near-dup: above-mean aHash bits over the
    // codec seam, banded Hamming candidate join, exact bit_count(xor)
    // verify — image dedup's plan shape driven through the stub codec
    // (integer-exact for the oracle; ImageIoCodec quality is
    // spec-pinned). Bounded to 2000 media: a 16-bit fingerprint's
    // 8-bit bands saturate beyond that (the in-code dims note).
    "q_media_neardup" -> ((s, dir) => {
      import s.implicits._
      val feats = Multimodal.extractFeatures(
        media(s, dir).filter(col("media_id") < 2000)
          .as[Multimodal.MediaRecord])
      val withFp = feats.toDF().select(col("media_id"),
        Multimodal.featureFingerprint(col("feature"), 16).as("fp"))
      Multimodal.nearDupPairs(withFp, "media_id", "fp",
        nBands = 2, bandBits = 8, maxHamming = 1)
        .select(col("a"), col("b"), col("ham"))
        .orderBy("a", "b")
    }))

  val oracles: Map[String, String] = Map(
    "q_media_mp4_meta" ->
      """WITH m AS (SELECT doc_id AS media_id,
           octet_length(encode(text)) AS len,
           600 + (doc_id % 5) * 120 AS ts
         FROM documents WHERE doc_id % 3 = 2)
         SELECT media_id, 'isom' AS brand,
           CAST(ts AS BIGINT) AS timescale,
           CAST(len * 50 + (media_id % 7) * 3 AS BIGINT)
             AS duration_ticks,
           CAST(((len * 50 + (media_id % 7) * 3) * 1000) // ts AS BIGINT)
             AS duration_ms,
           1 AS n_tracks, 'vide' AS handler,
           CASE (media_id // 3) % 3 WHEN 0 THEN 'avc1'
             WHEN 1 THEN 'hev1' ELSE 'vp09' END AS codec,
           CAST(160 * (1 + media_id % 4) AS INTEGER) AS width,
           CAST(90 * (1 + media_id % 4) AS INTEGER) AS height,
           CAST(4 AS BIGINT) AS n_samples,
           CAST(len AS BIGINT) AS media_bytes
         FROM m ORDER BY media_id""",
    "q_media_mp4_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS ph,
           octet_length(encode(text)) AS len
         FROM documents WHERE doc_id % 3 = 2),
         series AS (SELECT CAST(unnest(range(0, 4)) AS INTEGER) AS i),
         f AS (SELECT m.media_id, s.i,
             (m.len // 4) +
               CASE WHEN s.i < m.len % 4 THEN 1 ELSE 0 END AS sz,
             s.i * (m.len // 4) + least(s.i, m.len % 4) AS st,
             m.ph
           FROM m CROSS JOIN series s)
         SELECT media_id, i AS frame_idx,
           CAST(sz AS INTEGER) AS n_frame_bytes,
           md5(substring(ph, CAST(2 * st + 1 AS INTEGER),
             CAST(2 * sz AS INTEGER))) AS frame_md5
         FROM f WHERE sz > 0
         ORDER BY media_id, frame_idx""",
    "q_media_neardup" ->
      """WITH f AS (SELECT doc_id AS media_id, md5(text) AS digest
           FROM documents WHERE doc_id < 2000),
         series AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS i),
         bytes AS (SELECT f.media_id, s.i,
             CAST(('0x' || substr(f.digest, 2 * s.i + 1, 2)) AS INTEGER)
               AS byte
           FROM f CROSS JOIN series s),
         tot AS (SELECT media_id, CAST(sum(byte) AS BIGINT) AS total
           FROM bytes GROUP BY 1),
         fp AS (SELECT b.media_id,
             CAST(sum(CASE WHEN 16 * b.byte > t.total
               THEN (CAST(1 AS BIGINT) << b.i) ELSE 0 END) AS BIGINT)
               AS fp
           FROM bytes b JOIN tot t ON t.media_id = b.media_id
           GROUP BY 1),
         band AS (SELECT media_id, fp, 0 AS band_idx,
             fp % 256 AS band_val FROM fp
           UNION ALL SELECT media_id, fp, 1, fp // 256 FROM fp),
         cand AS (SELECT DISTINCT x.media_id AS a, y.media_id AS b,
             x.fp AS fpa, y.fp AS fpb
           FROM band x JOIN band y ON x.band_idx = y.band_idx
             AND x.band_val = y.band_val AND x.media_id < y.media_id)
         SELECT a, b, CAST(bit_count(xor(fpa, fpb)) AS INTEGER) AS ham
         FROM cand WHERE bit_count(xor(fpa, fpb)) <= 1
         ORDER BY a, b""",
    "q_media_loudness" ->
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS ph,
           CAST(octet_length(encode(text)) AS BIGINT) AS len
         FROM documents WHERE doc_id % 3 = 1),
         s AS (SELECT media_id, len, ph,
             unnest(range(0, len)) AS i FROM m),
         b AS (SELECT media_id, len,
             CAST(('0x' || substr(ph, CAST(2 * i + 1 AS INTEGER), 2))
               AS INTEGER) - 128 AS dev
           FROM s),
         a AS (SELECT media_id, max(len) AS n_samples,
             CAST(sum(CASE WHEN abs(dev) <= 16 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_quiet,
             CAST(sum(dev * dev) AS BIGINT) AS dev2_sum,
             CAST(max(abs(dev)) AS INTEGER) AS peak
           FROM b GROUP BY 1)
         SELECT media_id, n_samples, n_quiet, dev2_sum, peak,
           round(CAST(n_quiet AS DOUBLE) / n_samples, 6) AS quiet_ratio_r
         FROM a ORDER BY media_id""",
    // same hex byte slices as loudness; the angle and energy
    // expressions share the Spark side's association exactly
    "q_media_spectrum" -> {
      def pair(k: Int) =
        s"""sum(CAST(CAST(dev AS DOUBLE) *
               cos(((2.0 * pi()) * ($k.0 * CAST(i AS DOUBLE))) /
                 CAST(n AS DOUBLE)) AS DECIMAL(28,14))) AS c$k,
             sum(CAST(CAST(dev AS DOUBLE) *
               sin(((2.0 * pi()) * ($k.0 * CAST(i AS DOUBLE))) /
                 CAST(n AS DOUBLE)) AS DECIMAL(28,14))) AS s$k"""
      def energy(k: Int) =
        s"""round((CAST(c$k AS DOUBLE) * CAST(c$k AS DOUBLE) +
             CAST(s$k AS DOUBLE) * CAST(s$k AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS e${k}_r"""
      s"""WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS ph,
           CAST(octet_length(encode(text)) AS BIGINT) AS n
         FROM documents WHERE doc_id % 3 = 1),
         s AS (SELECT media_id, n, ph,
             unnest(range(0, n)) AS i FROM m),
         b AS (SELECT media_id, n, CAST(i AS BIGINT) AS i,
             CAST(('0x' || substr(ph, CAST(2 * i + 1 AS INTEGER), 2))
               AS INTEGER) - 128 AS dev
           FROM s),
         a AS (SELECT media_id, n,
             ${pair(1)}, ${pair(2)}, ${pair(3)}
           FROM b GROUP BY 1, 2)
         SELECT media_id, n AS n_samples,
           ${energy(1)}, ${energy(2)}, ${energy(3)}
         FROM a ORDER BY media_id"""
    },
    "q_media_features" ->
      """WITH f AS (SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
         FROM documents),
         series AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS i)
         SELECT f.media_id, f.kind, f.n_bytes, f.digest,
           CAST(sum(CAST(('0x' || substr(f.digest, 2*s.i + 1, 2)) AS INTEGER))
             AS BIGINT) AS feat_sum_x256
         FROM f CROSS JOIN series s
         GROUP BY 1, 2, 3, 4 ORDER BY media_id""",
    "q_media_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS ph,
           octet_length(encode(text)) AS len FROM documents),
         p AS (SELECT media_id, ph, len,
           greatest(1, len // 4) AS step FROM m),
         series AS (SELECT CAST(unnest(range(0, 4)) AS INTEGER) AS i)
         SELECT p.media_id, s.i AS frame_idx,
           CAST(least((s.i + 1) * p.step, p.len) - s.i * p.step AS INTEGER)
             AS n_frame_bytes,
           md5(substring(p.ph, 2 * s.i * p.step + 1,
             2 * (least((s.i + 1) * p.step, p.len) - s.i * p.step)))
             AS frame_md5
         FROM p CROSS JOIN series s
         WHERE s.i < least(4, p.len)
         ORDER BY media_id, frame_idx""",
    // the resample index math ((i*len)//tlen over a constant series)
    // mirrors StubCodec.resize exactly; the series bound is oracle-side
    // only, and a payload long enough to exceed it fails LOUDLY (the
    // guard CASE casts a string to BIGINT) instead of silently dropping
    // resample positions and reporting a false mismatch
    "q_media_resize" ->
      """WITH m AS (SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS kind,
           hex(encode(text)) AS ph,
           CAST(octet_length(encode(text)) AS BIGINT) AS len
         FROM documents),
         p0 AS (SELECT media_id, kind, ph, len,
           CASE WHEN len = 0 THEN 0
                WHEN kind = 'audio' THEN len
                ELSE greatest(1, (len * 192) // 768) END AS tlen
         FROM m),
         p AS (SELECT media_id, kind, ph, len,
           CASE WHEN kind <> 'audio' AND tlen >= 4096
                THEN CAST('q_media_resize: payload exceeds the oracle
                           resample series cap — raise range(0, 4096)'
                          AS BIGINT)
                ELSE tlen END AS tlen
         FROM p0),
         series AS (SELECT CAST(unnest(range(0, 4096)) AS BIGINT) AS i),
         rs AS (SELECT p.media_id,
             string_agg(substr(p.ph, 2 * ((s.i * p.len) // p.tlen) + 1, 2),
               '' ORDER BY s.i) AS rph
           FROM p JOIN series s ON s.i < p.tlen
           WHERE p.kind <> 'audio'
           GROUP BY p.media_id)
         SELECT p.media_id, p.kind,
           CAST(p.tlen AS INTEGER) AS n_bytes,
           CASE WHEN p.len = 0 THEN md5('')
                WHEN p.kind = 'audio' THEN md5(p.ph)
                ELSE md5(rs.rph) END AS payload_md5
         FROM p LEFT JOIN rs ON p.media_id = rs.media_id
         ORDER BY p.media_id""",
    "q_media_meta" ->
      """WITH m AS (SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           CASE WHEN doc_id % 3 <> 1 THEN 32 ELSE 0 END AS width,
           CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS sample_rate
         FROM documents)
         SELECT kind, count(*) AS n,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           max(width) AS max_width,
           max(sample_rate) AS max_sample_rate
         FROM m GROUP BY kind ORDER BY kind""")
}
