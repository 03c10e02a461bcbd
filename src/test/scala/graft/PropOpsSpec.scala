package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.VectorFunctions
import graft.ops.{CosineLsh, Corpus}
import graft.streaming.StreamAnn

/** Randomized invariants for the curation/vector ops — each property
  * materializes ONE DataFrame of generated rows and asserts per-row,
  * so the whole property is a single Spark job (the PropHelpers
  * pure-function style does not fit Column-level ops).
  */
class PropOpsSpec extends AnyFunSuite with PropHelpers {

  lazy val spark = TestSpark.spark

  test("dedupSegments invariants hold for random corpora") {
    import spark.implicits._
    // random docs over a tiny token alphabet so spans genuinely
    // repeat across documents; lengths 1..35 exercise partial spans
    var seed = org.scalacheck.rng.Seed(11L)
    def next(lo: Int, hi: Int): Int = {
      val (v, s2) = Gen.choose(lo, hi).apply(
        Gen.Parameters.default, seed).map(v => (v, seed.next))
        .getOrElse((lo, seed.next))
      seed = s2
      v
    }
    val docsSeq = Seq.tabulate(80) { i =>
      val n = next(1, 35)
      (i.toLong, (1 to n).map(_ => s"w${next(0, 5)}").mkString(" "))
    }
    val df = docsSeq.toDF("doc_id", "text")
    val segTokens = 8
    val out = graft.ops.TextDedup
      .dedupSegments(df, "doc_id", "text", segTokens)
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> r).toMap
    // recompute ground truth in plain Scala: first occurrence by
    // (doc_id, seg_idx) of every distinct span wins
    val firstSeen = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val segsOf = docsSeq.map { case (id, text) =>
      id -> text.split(" ").grouped(segTokens).map(_.mkString(" ")).toSeq
    }
    for ((id, segs) <- segsOf; (s, i) <- segs.zipWithIndex)
      if (!firstSeen.contains(s)) firstSeen(s) = (id, i.toLong)
    for ((id, segs) <- segsOf) {
      val (_, nSegs, nKept, clean) = out(id)
      val keptSegs = segs.zipWithIndex.collect {
        case (s, i) if firstSeen(s) == ((id, i.toLong)) => s
      }
      assert(nSegs == segs.length.toLong, s"doc $id n_segs")
      assert(nKept == keptSegs.length.toLong, s"doc $id n_kept")
      val expected = if (keptSegs.isEmpty) None
        else Some(keptSegs.mkString(" "))
      assert(clean == expected, s"doc $id clean_text")
    }
  }

  test("chunkTokens invariants hold for random lengths and geometries") {
    import spark.implicits._
    val geoms = Seq((8, 4), (16, 0), (5, 4), (64, 16))
    for ((size, overlap) <- geoms) {
      val step = size - overlap
      // random doc lengths 1..40, tokens are "i:<pos>" so coverage and
      // order are checkable from the chunk text itself
      val lens = {
        var seed = org.scalacheck.rng.Seed(7L)
        Seq.tabulate(60) { i =>
          val (n, s2) = Gen.choose(1, 40).apply(
            Gen.Parameters.default, seed).map(v => (v, seed.next))
            .getOrElse((1, seed.next))
          seed = s2
          (i.toLong, n)
        }
      }
      val df = lens.map { case (id, n) =>
        (id, (1 to n).map(p => s"t$p").mkString(" "))
      }.toDF("id", "text")
      val out = Corpus.chunkTokens(df, "id", "text", size, overlap)
        .as[(Long, Long, String, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      for ((id, n) <- lens) {
        val chunks = out(id)
        val expected = (Math.max(1, n - overlap) + step - 1) / step
        assert(chunks.length == expected,
          s"doc $id len $n size $size overlap $overlap: " +
            s"${chunks.length} chunks, expected $expected")
        // indices are 0..k-1; every token covered exactly once by the
        // union of de-overlapped chunks; no chunk exceeds `size`
        assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
        assert(chunks.forall(_._4 <= size))
        val toks = chunks.flatMap(_._3.split(" ")).toSet
        assert(toks == (1 to n).map(p => s"t$p").toSet)
        // consecutive chunks start exactly `step` tokens apart
        chunks.sliding(2).foreach {
          case Array(c1, c2) =>
            assert(c1._3.split(" ").head.drop(1).toInt + step ==
              c2._3.split(" ").head.drop(1).toInt)
          case _ =>
        }
      }
    }
  }

  test("packSequences invariants hold for random doc lengths") {
    import spark.implicits._
    for (window <- Seq(1, 7, 64, 1000)) {
      val lens = {
        var seed = org.scalacheck.rng.Seed(13L)
        Seq.tabulate(80) { i =>
          val (n, s2) = Gen.choose(0, 150).apply(
            Gen.Parameters.default, seed).map(v => (v, seed.next))
            .getOrElse((0, seed.next))
          seed = s2
          (i.toLong, n.toLong)
        }
      }
      val df = lens.toDF("doc_id", "n_tokens")
      val out = Corpus.packSequences(df, "doc_id", "n_tokens", window)
        .as[(Long, Long, Long, Long, Long)].collect()
      val total = lens.map(_._2).sum
      // global tiling: token mass is conserved, every sequence except
      // the last holds exactly `window` tokens, and within each doc
      // the spans tile [0, n) contiguously in seq order
      assert(out.map(_._4).sum == total)
      val bySeq = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
      val lastSeq = if (total == 0) -1L else (total - 1) / window
      bySeq.foreach { case (seq, mass) =>
        if (seq < lastSeq) assert(mass == window, s"seq $seq: $mass")
        else assert(mass == total - lastSeq * window)
      }
      for ((id, n) <- lens if n > 0) {
        val spans = out.filter(_._2 == id).sortBy(_._1)
        assert(spans.head._3 == 0L)
        assert(spans.last._3 + spans.last._4 == n)
        spans.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._1 + 1 == b._1, s"doc $id skips a sequence")
            assert(a._3 + a._4 == b._3, s"doc $id spans not contiguous")
          case _ =>
        }
        // interior spans of a multi-sequence doc start at offset 0
        spans.init.drop(1).foreach(sp => assert(sp._5 == 0L))
      }
      assert(out.filter(_._2 == lens.find(_._2 == 0).map(_._1)
        .getOrElse(-99L)).isEmpty) // zero-token docs contribute nothing
    }
  }

  test("int8 quantization invariants hold for random vectors") {
    import spark.implicits._
    val vecs = {
      var seed = org.scalacheck.rng.Seed(11L)
      Seq.tabulate(80) { i =>
        val g = Gen.listOfN(16, Gen.chooseNum(-1e3, 1e3))
        val (v, s2) = g.apply(Gen.Parameters.default, seed)
          .map(l => (l, seed.next)).getOrElse((List.fill(16)(0.0), seed.next))
        seed = s2
        (i.toLong, v)
      }
    }
    val out = vecs.toDF("id", "v")
      .withColumn("scale", VectorFunctions.int8Scale(col("v")))
      .filter(col("scale") > 0)
      .withColumn("q", VectorFunctions.int8Quantize(col("v"), col("scale")))
      .as[(Long, Seq[Double], Double, Seq[Int])].collect()
    assert(out.nonEmpty)
    for ((_, v, scale, q) <- out) {
      assert(q.forall(c => c >= -127 && c <= 127))
      v.zip(q).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-9) }
      assert(q.exists(c => math.abs(c) == 127)) // the max element saturates
    }
  }

  test("StreamAnn.bucketOf is deterministic, in range, and equals the " +
    "batch bucket column for random vectors") {
    import spark.implicits._
    val k = 6; val dim = 12
    val planes = CosineLsh.planes(k, dim)
    val vecs = {
      var seed = org.scalacheck.rng.Seed(13L)
      Seq.tabulate(60) { i =>
        val g = Gen.listOfN(dim, Gen.chooseNum(-10.0, 10.0))
        val (v, s2) = g.apply(Gen.Parameters.default, seed)
          .map(l => (l, seed.next)).getOrElse((List.fill(dim)(0.0), seed.next))
        seed = s2
        (i.toLong, v: Seq[Double])
      }
    }
    val batch = vecs.toDF("id", "v")
      .select(col("id"), CosineLsh.bucketCol(col("v"), planes).as("b"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      val b = StreamAnn.bucketOf(v, planes)
      assert(b >= 0 && b < (1 << k))
      assert(b == StreamAnn.bucketOf(v, planes))
      assert(b == batch(id), s"stream/batch bucket mismatch for $id")
    }
  }

  test("upsertLatest invariants: idempotent, winner-per-id, order-free") {
    import spark.implicits._
    var seed = org.scalacheck.rng.Seed(17L)
    def next(lo: Int, hi: Int): Int = {
      val (v, s2) = Gen.choose(lo, hi).apply(
        Gen.Parameters.default, seed).map(v => (v, seed.next))
        .getOrElse((lo, seed.next))
      seed = s2
      v
    }
    // random revisions over few ids; versions unique per id by
    // construction (the operator's documented contract)
    val revs = (0 until 15).flatMap { id =>
      val nv = next(1, 5)
      new scala.util.Random(id).shuffle((1 to nv).toList)
        .map(v => (id.toLong, s"t$id-v$v", v.toLong))
    }
    val df = revs.toDF("id", "text", "version")
    val once = Corpus.upsertLatest(df, "id", "version")
    val got = once.as[(Long, String, Long)].collect().toSet
    // exactly one winner per id, and it is the max version
    val expect = revs.groupBy(_._1).map { case (_, g) => g.maxBy(_._3) }.toSet
    assert(got == expect)
    // idempotent: merging the merged snapshot changes nothing
    val twice = Corpus.upsertLatest(once, "id", "version")
      .as[(Long, String, Long)].collect().toSet
    assert(twice == got)
  }
}
