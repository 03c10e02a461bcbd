package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CosineLsh
import graft.streaming.StreamAnn

/** Property-fuzz of the streaming embedding near-dup matcher — the
  * vector twin of [[StreamDedupFuzzSpec]]: random low-dim integer
  * vectors (k=3 planes over dim 4 force bucket collisions), random
  * time-ordered micro-batch cuts, horizon-boundary spacings, zero
  * vectors (dropped — cosine undefined), and in-horizon
  * redeliveries. Emitted pairs must equal the horizon-windowed batch
  * set: same bucket, later−earlier ≤ horizon, round6(cos) ≥ τ, one
  * emission at the later vector's timestamp with the bit-exact
  * left-to-right cosine.
  */
class StreamAnnFuzzSpec extends AnyFunSuite with PropHelpers {

  private lazy val spark = TestSpark.spark

  private val K = 3
  private val Dim = 4
  private val Seed = 42L
  private val Tau = 0.2
  private val HorizonMs = 600L * 1000
  private val Base = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  private final case class PCase(
      vecs: Vector[Vector[Double]],
      secs: Vector[Long],
      cuts: Vector[Int],
      redeliveries: Vector[(Int, Int)])

  private val caseGen: Gen[PCase] = for {
    n <- Gen.choose(3, 10)
    comps <- Gen.listOfN(n * Dim, Gen.oneOf(-2.0, -1.0, 0.0, 1.0, 2.0))
    steps <- Gen.listOfN(n, Gen.oneOf(0L, 1L, 100L, 599L, 600L, 601L))
    nCuts <- Gen.choose(0, 3)
    cutPos <- Gen.listOfN(nCuts, Gen.choose(1, n - 1))
    nRe <- Gen.choose(0, 2)
    reIdx <- Gen.listOfN(nRe, Gen.choose(0, n - 1))
    reBatch <- Gen.listOfN(nRe, Gen.choose(0, nCuts))
  } yield PCase(comps.grouped(Dim).map(_.toVector).toVector,
    steps.scanLeft(0L)(_ + _).tail.toVector,
    cutPos.distinct.sorted.toVector,
    reIdx.zip(reBatch).toVector)

  // same left-to-right fold the operator documents (bit-exact)
  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def reference(c: PCase): Seq[(Long, Long, Long, Double)] = {
    val planes = CosineLsh.planes(K, Dim, Seed)
    val norm = c.vecs.map(v => math.sqrt(dot(v, v)))
    val bucket = c.vecs.map(v => StreamAnn.bucketOf(v, planes))
    val out = for {
      j <- c.vecs.indices
      i <- 0 until j
      if norm(i) > 0 && norm(j) > 0
      if bucket(i) == bucket(j)
      if (c.secs(j) - c.secs(i)) * 1000L <= HorizonMs
      cos = dot(c.vecs(i), c.vecs(j)) / (norm(i) * norm(j))
      if round6(cos) >= Tau
    } yield (i.toLong, j.toLong, Base + c.secs(j) * 1000L, cos)
    out.sorted
  }

  test("property: time-ordered splits with in-horizon redeliveries emit the horizon-windowed bucket pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    forAll(caseGen, n = 12) { c =>
      val rows = c.vecs.indices.map(i => StreamAnn.Vec(
        i.toLong, new Timestamp(Base + c.secs(i) * 1000L),
        c.vecs(i))).toVector
      val batches = sliceBatches(rows, c.cuts)
      val withRe = withRedeliveries(batches, c.redeliveries,
        (v: StreamAnn.Vec, i: Int) => v.vec_id == i.toLong, rows(_),
        eligible = (i, bi) => batches.take(bi + 1).flatten
          .map(_.ts.getTime).max - rows(i).ts.getTime <= HorizonMs)
      val input = MemoryStream[StreamAnn.Vec]
      val sink = s"sann_fuzz_${System.nanoTime()}"
      // delay > horizon: with "0 seconds" any row whose event time
      // ties the previous batch's max is dropped by the late-row
      // filter (ts <= watermark) before reaching the operator, and
      // every redelivery would be silently dropped too — the guard
      // under test would never fire. 660 s keeps all in-horizon
      // deliveries AND redeliveries alive; emission here is
      // arrival-driven, so the delay changes nothing else.
      val q = StreamAnn.candidatePairs(input.toDS(), k = K, dim = Dim,
        seed = Seed, threshold = Tau, watermarkDelay = "660 seconds",
        horizonMs = HorizonMs)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        withRe.foreach { b =>
          if (b.nonEmpty) { input.addData(b: _*); q.processAllAvailable() }
        }
        val got = spark.table(sink)
          .as[(Long, Long, Timestamp, Double)].collect()
          .map { case (a, b, ts, cos) => (a, b, ts.getTime, cos) }
          .toSeq.sorted
        assert(got == reference(c),
          s"\ncase=$c\ngot=$got\nwant=${reference(c)}")
      } finally {
        q.stop()
        spark.catalog.dropTempView(sink)
      }
    }
  }
}
