package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Mp4

/** Property fuzz of the ISO-BMFF parser against ADVERSARIAL box
  * structure — the parser walks untrusted bytes inside executor
  * tasks, so the contract is: the exact expected Info for every
  * structurally sound assembly (regardless of sibling order, unknown
  * interleave, nesting depth, largesize/co64/v1 encodings), and an
  * honest Option — never a throw, never an out-of-bounds slice — for
  * corrupted or truncated bytes.
  *
  * The assembler here is deliberately INDEPENDENT of [[Mp4.build]]:
  * it produces shapes the writer cannot (64-bit largesize on any box,
  * co64 offsets past 2^32, mvhd/tkhd version-1 headers, multiple
  * traks, zero-size final boxes), so the identity is pinned against
  * the spec's byte layout, not against the writer's habits.
  */
class Mp4FuzzSpec extends AnyFunSuite with PropHelpers {

  // ---- raw byte assembly ----

  private def be32(v: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
    b.putInt(v.toInt); b.array()
  }
  private def be64(v: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
    b.putLong(v); b.array()
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p, 0, out, off, p.length); off += p.length
    }
    out
  }
  private def box(tpe: String, payload: Array[Byte],
      large: Boolean = false): Array[Byte] =
    if (large) cat(be32(1L), tpe.getBytes("US-ASCII"),
      be64(16L + payload.length), payload)
    else cat(be32(8L + payload.length), tpe.getBytes("US-ASCII"), payload)

  // fourccs the parser does NOT know — includes the real padding /
  // metadata types a wild file carries between the boxes we read
  private val unknownPool =
    Vector("free", "skip", "udta", "wide", "uuid", "meta", "iods", "zzzz")

  // ---- generated file description ----

  private case class TrkSpec(
      handler: String, codec: String, w: Int, h: Int,
      fixed: Long, // stsz fixed-size form when != 0 (no table)
      sizes: Vector[Long], offsets: Vector[Long],
      co64: Boolean, tkhdV1: Boolean) {
    def expected(): Mp4.Track = Mp4.Track(handler, codec, w, h,
      if (fixed != 0L) Vector.fill(sizes.length)(fixed) else sizes,
      offsets)
  }

  private case class FileSpec(
      brand: String, ts: Long, dur: Long, mvhdV1: Boolean,
      tracks: Vector[TrkSpec], seed: Long)

  private val genTrk: Gen[TrkSpec] = for {
    handler <- Gen.oneOf("vide", "soun", "text")
    codec <- Gen.oneOf("avc1", "hev1", "mp4a", "vp09")
    w <- Gen.chooseNum(0, 0xFFFF)
    h <- Gen.chooseNum(0, 0xFFFF)
    fixed <- Gen.frequency(3 -> Gen.const(0L), 1 -> Gen.chooseNum(1L, 4L))
    n <- Gen.chooseNum(0, 12)
    sizes <- Gen.listOfN(n, Gen.chooseNum(0L, 0xFFFFFFFFL))
    co64 <- Gen.oneOf(true, false)
    m <- Gen.chooseNum(0, 6)
    offsets <- Gen.listOfN(m,
      if (co64) Gen.chooseNum(0L, 1L << 40) // pins true 64-bit reads
      else Gen.chooseNum(0L, 0xFFFFFFFFL))
    v1 <- Gen.oneOf(true, false)
  } yield TrkSpec(handler, codec, w, h, fixed,
    sizes.toVector, offsets.toVector, co64, v1)

  private val genFile: Gen[FileSpec] = for {
    brand <- Gen.oneOf("isom", "mp42", "qt  ")
    ts <- Gen.chooseNum(0L, 0xFFFFFFFFL)
    mvhdV1 <- Gen.oneOf(true, false)
    dur <- if (mvhdV1) Gen.chooseNum(0L, Long.MaxValue)
           else Gen.chooseNum(0L, 0xFFFFFFFFL)
    ntr <- Gen.chooseNum(0, 2)
    tracks <- Gen.listOfN(ntr, genTrk)
    seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield FileSpec(brand, ts, dur, mvhdV1, tracks.toVector, seed)

  /** Assemble the file: every container's children are SHUFFLED and
    * interleaved with random unknown boxes (nested up to depth 2),
    * every box independently flips to the largesize encoding. Returns
    * the bytes and the expected parse (trak order follows the
    * shuffled document order).
    */
  private def assemble(fs: FileSpec): (Array[Byte], Mp4.Info) = {
    val rnd = new scala.util.Random(fs.seed)
    def large(): Boolean = rnd.nextInt(4) == 0
    def unknown(depth: Int): Array[Byte] = {
      val t = unknownPool(rnd.nextInt(unknownPool.length))
      val payload =
        if (depth > 0 && rnd.nextBoolean()) unknown(depth - 1)
        else { val a = new Array[Byte](rnd.nextInt(24)); rnd.nextBytes(a); a }
      box(t, payload, large())
    }
    def mixTagged(children: Vector[(Int, Array[Byte])])
        : (Array[Byte], Vector[Int]) = {
      val withU = children ++
        Vector.fill(rnd.nextInt(3))((-1, unknown(2)))
      val sh = rnd.shuffle(withU)
      (cat(sh.map(_._2): _*), sh.map(_._1).filter(_ >= 0))
    }
    def mix(children: Vector[Array[Byte]]): Array[Byte] =
      mixTagged(children.map((-1, _)))._1

    def trakBytes(t: TrkSpec): Array[Byte] = {
      val tkhdPayload = {
        val len = if (t.tkhdV1) 96 else 84
        val p = new Array[Byte](len)
        if (t.tkhdV1) p(0) = 1
        System.arraycopy(be32(t.w.toLong << 16), 0, p, len - 8, 4)
        System.arraycopy(be32(t.h.toLong << 16), 0, p, len - 4, 4)
        p
      }
      val tkhd = box("tkhd", tkhdPayload, large())
      val mdhd = box("mdhd", new Array[Byte](24), large())
      val hdlr = box("hdlr", cat(be32(0), be32(0),
        t.handler.getBytes("US-ASCII"), new Array[Byte](12)), large())
      val entry = box(t.codec, new Array[Byte](8))
      val stsd = box("stsd", cat(be32(0), be32(1), entry), large())
      val stsz = box("stsz",
        if (t.fixed != 0L)
          cat(be32(0), be32(t.fixed), be32(t.sizes.length.toLong))
        else cat(be32(0), be32(0), be32(t.sizes.length.toLong),
          cat(t.sizes.map(be32): _*)), large())
      val stcoB =
        if (t.co64) box("co64", cat(be32(0), be32(t.offsets.length.toLong),
          cat(t.offsets.map(be64): _*)), large())
        else box("stco", cat(be32(0), be32(t.offsets.length.toLong),
          cat(t.offsets.map(be32): _*)), large())
      val stbl = box("stbl", mix(Vector(stsd, stsz, stcoB)), large())
      val minf = box("minf", mix(Vector(stbl)), large())
      val mdia = box("mdia", mix(Vector(mdhd, hdlr, minf)), large())
      box("trak", mix(Vector(tkhd, mdia)), large())
    }

    val mvhdPayload =
      if (!fs.mvhdV1)
        cat(be32(0), be32(0), be32(0), be32(fs.ts), be32(fs.dur),
          new Array[Byte](80))
      else
        cat(Array[Byte](1, 0, 0, 0), be64(0), be64(0), be32(fs.ts),
          be64(fs.dur), new Array[Byte](80))
    val mvhd = box("mvhd", mvhdPayload, large())
    val (moovKids, trakOrder) = mixTagged(
      (-1, mvhd) +: fs.tracks.zipWithIndex.map { case (t, i) =>
        (i, trakBytes(t))
      })
    val moov = box("moov", moovKids, large())
    val mdatB = {
      val a = new Array[Byte](rnd.nextInt(32)); rnd.nextBytes(a)
      box("mdat", a, large())
    }
    val ftyp = box("ftyp", cat(fs.brand.getBytes("US-ASCII"),
      be32(0x200), "isom".getBytes("US-ASCII")), large())
    var bytes = cat(ftyp, mix(Vector(moov, mdatB)))
    // occasionally a ZERO-size final box (extends to end of file —
    // the spec's "last box" form): its payload absorbs the tail
    if (rnd.nextBoolean()) {
      val tail = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(tail)
      bytes = cat(bytes, be32(0L), "free".getBytes("US-ASCII"), tail)
    }
    val expTracks = trakOrder.map(i => fs.tracks(i).expected())
    (bytes, Mp4.Info(fs.brand, fs.ts, fs.dur, expTracks))
  }

  test("shuffled siblings + unknown interleave + largesize/co64/v1: parse is exactly the expected Info") {
    forAll(genFile, 200) { fs =>
      val (bytes, want) = assemble(fs)
      val got = Mp4.parse(bytes)
      assert(got.contains(want),
        s"spec=$fs\nwant=$want\ngot=$got")
    }
  }

  test("random byte corruption and truncation never throw; samples stay in bounds") {
    val gen = for {
      fs <- genFile
      k <- Gen.chooseNum(1, 12)
      flips <- Gen.listOfN(k,
        Gen.zip(Gen.chooseNum(0, Int.MaxValue), Gen.chooseNum(0, 255)))
      trunc <- Gen.chooseNum(0, Int.MaxValue)
    } yield (fs, flips, trunc)
    forAll(gen, 200) { case (fs, flips, trunc) =>
      val (b, _) = assemble(fs)
      val mut = b.clone()
      flips.foreach { case (p, v) => mut(p % mut.length) = v.toByte }
      val cut = java.util.Arrays.copyOf(mut, trunc % (mut.length + 1))
      // the contract under corruption is Option-or-honest-result,
      // NEVER a throw or an out-of-range slice in an executor task
      Mp4.parse(mut)
      Mp4.parse(cut)
      for (f <- Seq(mut, cut); s <- Mp4.samples(f, limit = 4))
        assert(s.length <= f.length)
    }
  }

  test("build→parse→samples roundtrip under random writer params; every prefix is safe") {
    val gen = for {
      len <- Gen.chooseNum(0, 64)
      data <- Gen.listOfN(len, Gen.chooseNum(0, 255))
      k <- Gen.chooseNum(1, 8)
      cuts <- Gen.listOfN(k - 1, Gen.chooseNum(0, len))
      ts <- Gen.chooseNum(1, Int.MaxValue)
      dur <- Gen.chooseNum(0L, 0xFFFFFFFFL)
      w <- Gen.chooseNum(0, 0xFFFF)
      h <- Gen.chooseNum(0, 0xFFFF)
    } yield (data.map(_.toByte).toArray, cuts.sorted :+ len, ts, dur, w, h)
    forAll(gen, 100) { case (data, bounds, ts, dur, w, h) =>
      // consecutive diffs of the sorted cut list: non-negative, sum to
      // len — zero-size samples are legal and exercised
      val sizes = (0 +: bounds).sliding(2).map(p => p(1) - p(0)).toSeq
      val f = Mp4.build(data, ts, dur, "avc1", w, h, sizes)
      val info = Mp4.parse(f).getOrElse(fail("built file did not parse"))
      assert(info.brand == "isom" && info.timescale == ts.toLong &&
        info.durationTicks == dur)
      val t = info.tracks match {
        case Vector(only) => only
        case other => fail(s"expected 1 track, got $other")
      }
      assert(t.handler == "vide" && t.codec == "avc1" &&
        t.width == w && t.height == h)
      assert(t.sampleSizes == sizes.map(_.toLong).toVector)
      // byte-exact extraction reassembles the original payload
      assert(cat(Mp4.samples(f): _*).toSeq == data.toSeq)
      // every truncation of a well-formed file is safe
      for (cut <- 0 to f.length by math.max(1, f.length / 16)) {
        val pre = java.util.Arrays.copyOf(f, cut)
        Mp4.parse(pre)
        for (s <- Mp4.samples(pre, limit = 2)) assert(s.length <= pre.length)
      }
    }
  }
}
