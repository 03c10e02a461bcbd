package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ISO-BMFF (MP4) container writer + parser — pure JDK byte
  * walking of the PUBLIC box layout (ISO/IEC 14496-12: every box is
  * `u32 size, 4cc type, payload`, containers nest). No codec anywhere:
  * this cracks the CONTAINER (brand, movie timescale/duration, track
  * handler + sample-entry fourcc, presentation dimensions, sample
  * sizes/offsets) — the metadata a 100 TB curation pass filters on
  * before ever paying for a frame decode. Frame DECODE stays behind
  * the [[Multimodal.MediaCodec]] stub (no pure-JDK H.264/HEVC exists),
  * but sample BYTE extraction is real: `stsz` + `stco` locate each
  * sample's exact byte range inside `mdat`.
  *
  * The writer emits the smallest spec-shaped file a parser should
  * accept (ftyp; moov with mvhd, one trak carrying tkhd/mdhd/hdlr and
  * an stbl with stsd/stsz/stco; mdat) — it exists so the engine can
  * synthesize deterministic real containers for gates and tests; the
  * parser is the production artifact and accepts files the writer
  * cannot produce (64-bit largesize, co64 offsets, multiple traks,
  * unknown boxes skipped by size).
  */
object Mp4 {

  final case class Track(
      handler: String, // 'vide' | 'soun' | …
      codec: String, // sample-entry fourcc: avc1 | hev1 | mp4a | …
      width: Int, // tkhd 16.16 integer part
      height: Int,
      sampleSizes: Vector[Long],
      chunkOffsets: Vector[Long])

  final case class Info(
      brand: String,
      timescale: Long,
      durationTicks: Long,
      tracks: Vector[Track]) {
    /** Decomposed (quotient first) so a v1 64-bit tick count cannot
      * overflow the ×1000: the remainder product is bounded by the
      * u32 timescale × 1000.
      */
    def durationMs: Long =
      if (timescale <= 0) 0L
      else durationTicks / timescale * 1000L +
        durationTicks % timescale * 1000L / timescale
    def mediaBytes: Long = tracks.map(_.sampleSizes.sum).sum
  }

  /** Parser bound on materialized sample tables (stsz/stco/co64 and
    * the table-less fixed-size stsz form): a crafted count inside a
    * large payload may be structurally consistent yet materialize a
    * huge Vector inside an executor task (the a2d570c cap closed only
    * the large-`fixed` case — a 512 MB payload declaring 10⁸ 1-byte
    * samples passed both the box-size and file-size checks). Beyond
    * this bound the file parses to None: a metadata pass that cannot
    * afford the table cannot honestly claim to have read it.
    */
  val MaxSampleTableEntries: Long = 1L << 20

  // ------------------------------------------------------------------
  // writer
  // ------------------------------------------------------------------

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + payload.length)
      .order(ByteOrder.BIG_ENDIAN)
    out.putInt(8 + payload.length)
    out.put(tpe.getBytes("US-ASCII"), 0, 4)
    out.put(payload)
    out.array()
  }

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p, 0, out, off, p.length); off += p.length
    }
    out
  }

  private def beInts(vals: Long*): Array[Byte] = {
    val b = ByteBuffer.allocate(vals.length * 4).order(ByteOrder.BIG_ENDIAN)
    vals.foreach(v => b.putInt(v.toInt))
    b.array()
  }

  private val UnityMatrix: Array[Byte] = beInts(
    0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)

  /** Build a single-video-track MP4 whose `mdat` carries `mdat` bytes
    * split into `sampleSizes` (must sum to `mdat.length`; zero-size
    * samples are legal). Deterministic byte-for-byte for fixed inputs.
    */
  def build(
      mdat: Array[Byte],
      timescale: Int,
      durationTicks: Long,
      codec: String,
      width: Int,
      height: Int,
      sampleSizes: Seq[Int]): Array[Byte] = {
    require(timescale > 0, s"timescale must be > 0, got $timescale")
    require(codec.length == 4, s"codec must be a 4cc, got '$codec'")
    require(sampleSizes.forall(_ >= 0) &&
      sampleSizes.map(_.toLong).sum == mdat.length,
      "sampleSizes must be >= 0 and sum to the mdat length")
    // the v0 boxes carry u32 ticks and u16 entry dimensions: values
    // beyond them would silently truncate through beInts/putShort and
    // break the documented parse-after-build identity
    require(durationTicks >= 0 && durationTicks <= 0xFFFFFFFFL,
      s"durationTicks must fit u32, got $durationTicks")
    require(width >= 0 && width <= 0xFFFF && height >= 0 && height <= 0xFFFF,
      s"width/height must fit u16, got ${width}x$height")
    val mvhd = box("mvhd", concat(
      beInts(0, 0, 0, timescale.toLong, durationTicks,
        0x00010000L), // version/flags, created, modified, ts, dur, rate
      Array[Byte](0x01, 0x00), // volume 1.0
      new Array[Byte](10), // reserved
      UnityMatrix,
      new Array[Byte](24), // pre_defined
      beInts(2))) // next_track_ID
    val tkhd = box("tkhd", concat(
      beInts(0x000007L, 0, 0, 1L, 0, durationTicks), // flags: enabled
      new Array[Byte](8), // reserved
      new Array[Byte](8), // layer, alt_group, volume, reserved
      UnityMatrix,
      beInts(width.toLong << 16, height.toLong << 16))) // 16.16
    val mdhd = box("mdhd", concat(
      beInts(0, 0, 0, timescale.toLong, durationTicks),
      Array[Byte](0x55, ((0xc4: Int) & 0xff).toByte), // language 'und'
      new Array[Byte](2)))
    val hdlr = box("hdlr", concat(
      beInts(0, 0),
      "vide".getBytes("US-ASCII"),
      new Array[Byte](12),
      new Array[Byte](1))) // empty null-terminated name
    val sampleEntry = box(codec, concat(
      new Array[Byte](6), // reserved
      Array[Byte](0, 1), // data_reference_index
      new Array[Byte](16), // pre_defined / reserved
      Array[Byte]((width >> 8).toByte, width.toByte,
        (height >> 8).toByte, height.toByte),
      beInts(0x00480000L, 0x00480000L), // 72 dpi
      new Array[Byte](4), // reserved
      Array[Byte](0, 1), // frame_count
      new Array[Byte](32), // compressorname
      Array[Byte](0, 0x18, -1, -1))) // depth 24, pre_defined -1
    val stsd = box("stsd", concat(beInts(0, 1), sampleEntry))
    val stsz = box("stsz", concat(
      beInts(0, 0, sampleSizes.length.toLong),
      beInts(sampleSizes.map(_.toLong): _*)))
    // stco is patched after the moov size is known: one chunk, at the
    // mdat payload's absolute file offset
    def stco(off: Long) = box("stco", beInts(0, 1, off))
    val ftyp = box("ftyp", concat(
      "isom".getBytes("US-ASCII"), beInts(0x200),
      "isom".getBytes("US-ASCII")))
    def moov(off: Long) = box("moov", concat(mvhd,
      box("trak", concat(tkhd,
        box("mdia", concat(mdhd, hdlr,
          box("minf",
            box("stbl", concat(stsd, stsz, stco(off))))))))))
    val moovLen = moov(0L).length // stco payload is fixed-width
    val mdatPayloadOff = ftyp.length.toLong + moovLen + 8
    concat(ftyp, moov(mdatPayloadOff), box("mdat", mdat))
  }

  // ------------------------------------------------------------------
  // parser
  // ------------------------------------------------------------------

  /** Walk `[from, to)` top-level boxes, invoking `f(type, payloadFrom,
    * payloadTo)` per box. Returns false on any structural violation
    * (truncated header, size pointing outside the range): a malformed
    * container must parse to None, never throw or silently misread.
    */
  private def walk(bytes: Array[Byte], from: Long, to: Long)(
      f: (String, Long, Long) => Boolean): Boolean = {
    var pos = from
    while (pos < to) {
      if (to - pos < 8) return false
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      val size32 = Integer.toUnsignedLong(b.getInt(pos.toInt))
      val tpe = new String(bytes, pos.toInt + 4, 4, "US-ASCII")
      var payloadFrom = pos + 8
      val boxEnd =
        if (size32 == 0L) to // box extends to end of enclosing range
        else if (size32 == 1L) { // 64-bit largesize follows the type
          if (to - pos < 16) return false
          payloadFrom = pos + 16
          pos + b.getLong(pos.toInt + 8)
        } else pos + size32
      if (boxEnd < payloadFrom || boxEnd > to) return false
      if (!f(tpe, payloadFrom, boxEnd)) return false
      pos = boxEnd
    }
    true
  }

  private def u32(bytes: Array[Byte], pos: Long): Long =
    Integer.toUnsignedLong(ByteBuffer.wrap(bytes)
      .order(ByteOrder.BIG_ENDIAN).getInt(pos.toInt))

  private def fourcc(bytes: Array[Byte], pos: Long): String =
    new String(bytes, pos.toInt, 4, "US-ASCII")

  /** Parse container metadata; None for anything that is not a
    * structurally sound MP4 with a `moov` (truncated boxes, non-BMFF
    * payloads, boxes overrunning their parent). Unknown boxes are
    * skipped by size — the spec's forward-compat rule.
    */
  def parse(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 8) return None
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var tracks = Vector.empty[Track]
    var sawMoov = false

    def parseStbl(from: Long, to: Long,
        t: Track): Option[Track] = {
      var tr = t
      val ok = walk(bytes, from, to) {
        case ("stsd", f0, t0) =>
          // version/flags + entry_count, then the first sample entry's
          // own box header carries the codec fourcc
          if (t0 - f0 >= 16 && u32(bytes, f0 + 4) >= 1) {
            tr = tr.copy(codec = fourcc(bytes, f0 + 12))
          }
          true
        case ("stsz", f0, t0) =>
          if (t0 - f0 < 12) false
          else {
            val fixed = u32(bytes, f0 + 4)
            val n = u32(bytes, f0 + 8)
            if (n > MaxSampleTableEntries) false
            else if (fixed != 0L) { // constant-size samples: no table
              // the fixed-size form has no table to bound n — also
              // sanity-cap against the FILE (all samples live in this
              // file's mdat)
              if (n > bytes.length.toLong / fixed) false
              else {
                tr = tr.copy(sampleSizes = Vector.fill(n.toInt)(fixed))
                true
              }
            } else if (t0 - f0 - 12 < n * 4) false
            else {
              tr = tr.copy(sampleSizes = Vector.tabulate(n.toInt)(i =>
                u32(bytes, f0 + 12 + 4L * i)))
              true
            }
          }
        case ("stco", f0, t0) =>
          if (t0 - f0 < 8) false
          else {
            val n = u32(bytes, f0 + 4)
            if (n > MaxSampleTableEntries || t0 - f0 - 8 < n * 4) false
            else {
              tr = tr.copy(chunkOffsets = Vector.tabulate(n.toInt)(i =>
                u32(bytes, f0 + 8 + 4L * i)))
              true
            }
          }
        case ("co64", f0, t0) =>
          if (t0 - f0 < 8) false
          else {
            val n = u32(bytes, f0 + 4)
            if (n > MaxSampleTableEntries || t0 - f0 - 8 < n * 8) false
            else {
              val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
              tr = tr.copy(chunkOffsets = Vector.tabulate(n.toInt)(i =>
                bb.getLong((f0 + 8 + 8L * i).toInt)))
              true
            }
          }
        case _ => true
      }
      if (ok) Some(tr) else None
    }

    def parseTrak(from: Long, to: Long): Option[Track] = {
      var tr = Track("", "", 0, 0, Vector.empty, Vector.empty)
      var ok = walk(bytes, from, to) {
        case ("tkhd", f0, t0) =>
          // width/height are the final two 16.16 words in BOTH tkhd
          // versions (v0 = 84-byte payload, v1 = 96)
          if (t0 - f0 >= 84) {
            tr = tr.copy(
              width = (u32(bytes, t0 - 8) >> 16).toInt,
              height = (u32(bytes, t0 - 4) >> 16).toInt)
          }
          true
        case ("mdia", f0, t0) =>
          walk(bytes, f0, t0) {
            case ("hdlr", f1, t1) =>
              if (t1 - f1 >= 12) tr = tr.copy(handler = fourcc(bytes, f1 + 8))
              true
            case ("minf", f1, t1) =>
              walk(bytes, f1, t1) {
                case ("stbl", f2, t2) =>
                  parseStbl(f2, t2, tr) match {
                    case Some(t3) => tr = t3; true
                    case None => false
                  }
                case _ => true
              }
            case _ => true
          }
        case _ => true
      }
      if (ok) Some(tr) else None
    }

    val ok = walk(bytes, 0L, bytes.length.toLong) {
      case ("ftyp", f0, t0) =>
        if (t0 - f0 >= 4) brand = fourcc(bytes, f0)
        true
      case ("moov", f0, t0) =>
        sawMoov = true
        walk(bytes, f0, t0) {
          case ("mvhd", f1, t1) =>
            // v0: timescale at +12, duration at +16 (v1 uses 64-bit
            // times — accepted, different offsets)
            if (t1 - f1 >= 20 && bytes(f1.toInt) == 0) {
              timescale = u32(bytes, f1 + 12)
              duration = u32(bytes, f1 + 16)
              true
            } else if (t1 - f1 >= 32 && bytes(f1.toInt) == 1) {
              val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
              timescale = u32(bytes, f1 + 20)
              duration = bb.getLong((f1 + 24).toInt)
              // a v1 tick count with the sign bit set is not a
              // duration — reject rather than emit negative
              // duration_ms downstream ("never silently misread")
              duration >= 0L
            } else true
          case ("trak", f1, t1) =>
            parseTrak(f1, t1) match {
              case Some(t) => tracks :+= t; true
              case None => false
            }
          case _ => true
        }
      case _ => true
    }
    if (ok && sawMoov) Some(Info(brand, timescale, duration, tracks))
    else None
  }

  /** Real sample-byte extraction via the parsed `stsz`/`stco` tables:
    * the samples of the FIRST track laid out in a single chunk (the
    * writer's shape). Multi-chunk layouts would need `stsc` to map
    * samples to chunks — out of scope, returns empty (callers fall
    * back to the stub). Every slice is bounds-checked: a lying offset
    * table yields the honest prefix, never an exception in a task.
    * `limit` caps how many samples are COPIED — a take-the-first-n
    * caller ([[Multimodal.Mp4Codec]]) must not pay a full-mdat copy
    * for the samples it discards.
    */
  def samples(bytes: Array[Byte],
      limit: Int = Int.MaxValue): Seq[Array[Byte]] =
    parse(bytes) match {
      case Some(info) =>
        info.tracks.headOption match {
          case Some(t) if t.chunkOffsets.length == 1 =>
            var off = t.chunkOffsets.head
            val out = Vector.newBuilder[Array[Byte]]
            var i = 0
            var okSoFar = true
            while (i < math.min(t.sampleSizes.length, limit) && okSoFar) {
              val sz = t.sampleSizes(i)
              if (off < 0 || sz < 0 || off + sz > bytes.length) {
                okSoFar = false
              } else {
                out += java.util.Arrays.copyOfRange(
                  bytes, off.toInt, (off + sz).toInt)
                off += sz
              }
              i += 1
            }
            out.result()
          case _ => Seq.empty
        }
      case None => Seq.empty
    }
}
