package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Mp4, Multimodal}

class Mp4Spec extends AnyFunSuite {

  private val mdat = "hello mp4 container world!".getBytes("UTF-8")
  private def sizes(len: Int, k: Int): Seq[Int] = {
    val base = len / k; val rem = len % k
    (0 until k).map(i => base + (if (i < rem) 1 else 0))
  }
  private def fixture: Array[Byte] =
    Mp4.build(mdat, timescale = 600, durationTicks = 1234L,
      codec = "avc1", width = 640, height = 360,
      sampleSizes = sizes(mdat.length, 4))

  private def u32(b: Array[Byte], i: Int): Long =
    Integer.toUnsignedLong(
      ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN).getInt(i))
  private def find(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    (0 to b.length - 4).find(i =>
      b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) &&
        b(i + 3) == t(3)).getOrElse(fail(s"no '$tag' box in fixture"))
  }

  test("written layout pins the ISO/IEC 14496-12 field offsets, independent of the parser") {
    val b = fixture
    // file starts with the ftyp box; brand right after the header
    assert(new String(b, 4, 4, "US-ASCII") == "ftyp")
    assert(new String(b, 8, 4, "US-ASCII") == "isom")
    // mvhd v0: timescale at payload+12, duration at payload+16
    val mvhd = find(b, "mvhd") + 4
    assert(u32(b, mvhd + 12) == 600L)
    assert(u32(b, mvhd + 16) == 1234L)
    // tkhd: width/height are the last two 16.16 words of the payload
    val tkhd = find(b, "tkhd")
    val tkhdEnd = tkhd - 4 + u32(b, tkhd - 4).toInt
    assert(u32(b, tkhdEnd - 8) == 640L << 16)
    assert(u32(b, tkhdEnd - 4) == 360L << 16)
    // hdlr handler_type at payload+8
    assert(new String(b, find(b, "hdlr") + 4 + 8, 4, "US-ASCII") == "vide")
    // stsd: first sample entry's fourcc at payload+12
    assert(new String(b, find(b, "stsd") + 4 + 12, 4, "US-ASCII") == "avc1")
    // stco's single chunk offset points at the mdat PAYLOAD, whose
    // bytes are the original data
    val stco = find(b, "stco") + 4
    val off = u32(b, stco + 8).toInt
    assert(b.slice(off, off + mdat.length).toSeq == mdat.toSeq)
    assert(new String(b, off - 4, 4, "US-ASCII") == "mdat")
  }

  test("parse(build(...)) roundtrips every declared field") {
    val info = Mp4.parse(fixture).getOrElse(fail("fixture did not parse"))
    assert(info.brand == "isom")
    assert(info.timescale == 600L)
    assert(info.durationTicks == 1234L)
    assert(info.durationMs == 1234L * 1000L / 600L)
    assert(info.tracks.length == 1)
    val t = info.tracks.head
    assert(t.handler == "vide")
    assert(t.codec == "avc1")
    assert((t.width, t.height) == ((640, 360)))
    assert(t.sampleSizes == sizes(mdat.length, 4).map(_.toLong).toVector)
    assert(info.mediaBytes == mdat.length.toLong)
  }

  test("samples() returns the exact byte ranges stsz/stco declare") {
    val got = Mp4.samples(fixture).map(new String(_, "UTF-8"))
    val sz = sizes(mdat.length, 4)
    val starts = sz.scanLeft(0)(_ + _)
    val want = sz.indices.map(i =>
      new String(mdat.slice(starts(i), starts(i) + sz(i)), "UTF-8"))
    assert(got == want)
    assert(got.mkString == new String(mdat, "UTF-8"))
  }

  test("edge shapes: empty mdat, zero-size samples, short payloads") {
    val empty = Mp4.build(Array.empty, 1000, 0L, "hev1", 0, 0, Seq(0, 0))
    val ei = Mp4.parse(empty).getOrElse(fail("empty-mdat mp4 must parse"))
    assert(ei.tracks.head.sampleSizes == Vector(0L, 0L))
    assert(ei.mediaBytes == 0L)
    assert(Mp4.samples(empty).forall(_.isEmpty))
    // 3 bytes over 4 samples: one zero-size tail sample
    val short = Mp4.build("abc".getBytes, 90000, 5L, "vp09", 16, 9,
      sizes(3, 4))
    assert(Mp4.samples(short).map(new String(_)) ==
      Seq("a", "b", "c", ""))
  }

  test("malformed inputs parse to None, never throw: every truncation prefix") {
    val b = fixture
    // each strict prefix is either structurally rejected or —
    // when the cut lands exactly between top-level boxes — parses
    // without the mdat; no prefix may throw
    (0 until b.length).foreach { n =>
      Mp4.parse(b.take(n)) // must not throw
    }
    assert(Mp4.parse(Array.empty) == None)
    assert(Mp4.parse("not an mp4 at all, just text bytes".getBytes) == None)
    assert(Mp4.parse(null) == None)
    // a box whose size overruns its parent is rejected
    val lying = b.clone()
    val stsz = find(b, "stsz") - 4
    ByteBuffer.wrap(lying).order(ByteOrder.BIG_ENDIAN)
      .putInt(stsz, Int.MaxValue)
    assert(Mp4.parse(lying) == None)
    // fixed-size stsz with a lying giant count: the fixed form has no
    // table to bound it, so the parser must cap against the file size
    // (None), not materialize a multi-GB Vector
    val bigN = b.clone()
    val szPay = find(b, "stsz") + 4
    val bb2 = ByteBuffer.wrap(bigN).order(ByteOrder.BIG_ENDIAN)
    bb2.putInt(szPay + 4, 1) // sample_size = 1 (fixed form)
    bb2.putInt(szPay + 8, Int.MaxValue) // sample_count
    assert(Mp4.parse(bigN) == None)
    // a PLAUSIBLE fixed-size table still parses
    val okN = b.clone()
    val bb3 = ByteBuffer.wrap(okN).order(ByteOrder.BIG_ENDIAN)
    bb3.putInt(szPay + 4, 2)
    bb3.putInt(szPay + 8, 5)
    assert(Mp4.parse(okN).get.tracks.head.sampleSizes ==
      Vector.fill(5)(2L))
    // small-`fixed` DoS: a LARGE payload with sample_size=1 and a
    // file-length-sized count passes the bytes/fixed check — the
    // MaxSampleTableEntries cap must reject it (review finding r14)
    val bigPayload = Mp4.build(new Array[Byte](2 * 1024 * 1024), 600,
      1L, "avc1", 8, 8, sizes(2 * 1024 * 1024, 4))
    val szPay2 = find(bigPayload, "stsz") + 4
    val bb4 = ByteBuffer.wrap(bigPayload).order(ByteOrder.BIG_ENDIAN)
    bb4.putInt(szPay2 + 4, 1)
    bb4.putInt(szPay2 + 8, 2 * 1024 * 1024) // > MaxSampleTableEntries
    assert(Mp4.parse(bigPayload) == None)
    // a v1 mvhd whose 64-bit tick count has the sign bit set is not a
    // duration: reject, never emit a negative duration_ms
    val v1neg = b.clone()
    val mv = find(b, "mvhd") + 4
    v1neg(mv) = 1 // version byte
    ByteBuffer.wrap(v1neg).order(ByteOrder.BIG_ENDIAN)
      .putLong(mv + 24, Long.MinValue + 5)
    assert(Mp4.parse(v1neg) == None)
    // samples() survives a lying chunk offset (honest prefix, no crash)
    val badOff = b.clone()
    val stco = find(b, "stco") + 4
    ByteBuffer.wrap(badOff).order(ByteOrder.BIG_ENDIAN)
      .putInt(stco + 8, b.length - 2)
    assert(Mp4.samples(badOff).length < 4)
  }

  test("largesize (size==1 + u64) and size==0 (to end) box headers are accepted") {
    val plain = fixture
    // rewrite the top-level mdat header as a largesize header
    val mdatBox = find(plain, "mdat") - 4
    val body = plain.drop(mdatBox + 8)
    val pre = plain.take(mdatBox)
    val large = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
      .putInt(1).put("mdat".getBytes("US-ASCII"))
      .putLong(16L + body.length).array()
    val rebuilt = pre ++ large ++ body
    assert(Mp4.parse(rebuilt).map(_.timescale) == Some(600L))
    // size==0: mdat extends to EOF
    val zero = plain.clone()
    ByteBuffer.wrap(zero).order(ByteOrder.BIG_ENDIAN).putInt(mdatBox, 0)
    assert(Mp4.parse(zero).map(_.durationTicks) == Some(1234L))
  }

  test("durationMs survives v1 64-bit tick counts; build rejects field overflow") {
    // decomposed quotient-first math: ticks near Long.MaxValue must
    // not wrap negative through the x1000
    val big = Mp4.Info("isom", 90000L, Long.MaxValue / 2, Vector.empty)
    assert(big.durationMs > 0)
    assert(big.durationMs == Long.MaxValue / 2 / 90000L * 1000L +
      Long.MaxValue / 2 % 90000L * 1000L / 90000L)
    assert(Mp4.Info("isom", 0L, 5L, Vector.empty).durationMs == 0L)
    // writer fields that would silently truncate are require-guarded
    intercept[IllegalArgumentException] {
      Mp4.build(Array.empty, 600, 1L << 32, "avc1", 1, 1, Seq(0))
    }
    intercept[IllegalArgumentException] {
      Mp4.build(Array.empty, 600, 1L, "avc1", 0x10000, 1, Seq(0))
    }
  }

  test("samples(limit) copies only the requested prefix") {
    val two = Mp4.samples(fixture, limit = 2).map(new String(_, "UTF-8"))
    val all = Mp4.samples(fixture).map(new String(_, "UTF-8"))
    assert(two == all.take(2))
  }

  test("Mp4Codec: container samples for mp4 payloads, stub fallback otherwise") {
    val real = Multimodal.Mp4Codec.sampleFrames(fixture, 4)
    assert(real.map(new String(_, "UTF-8")).mkString ==
      new String(mdat, "UTF-8"))
    val plain = "no container here".getBytes
    assert(Multimodal.Mp4Codec.sampleFrames(plain, 4).map(_.toSeq) ==
      Multimodal.StubCodec.sampleFrames(plain, 4).map(_.toSeq))
    // features/resize stay stub-backed (decode needs a native codec)
    assert(Multimodal.Mp4Codec.extractFeatures(fixture).toSeq ==
      Multimodal.StubCodec.extractFeatures(fixture).toSeq)
  }
}
