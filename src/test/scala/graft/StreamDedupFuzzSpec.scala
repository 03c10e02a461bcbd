package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Property-fuzz of the streaming MinHash near-dup matcher: random
  * short texts over a tiny token alphabet (forced bucket collisions —
  * the CLAUDE.md tiny-width rule), random time-ordered micro-batch
  * cuts, horizon-boundary arrival spacings, and redeliveries. The
  * emitted pair multiset must equal the horizon-windowed batch pairs:
  * for every same-bucket (earlier, later) pair with
  * `later.ts − earlier.ts ≤ horizon`, one emission per SHARED band at
  * the later doc's timestamp — and a redelivered still-in-horizon doc
  * must re-emit nothing (the state's doc_id guard).
  */
class StreamDedupFuzzSpec extends AnyFunSuite with PropHelpers {

  private lazy val spark = TestSpark.spark

  private val ShingleN = 2
  private val NumHashes = 6
  private val Bands = 3
  private val Threshold = 0.3
  private val HorizonMs = 600L * 1000
  private val Base = Timestamp.valueOf("2024-01-01 10:00:00").getTime

  private final case class PCase(
      texts: Vector[String],
      secs: Vector[Long], // nondecreasing offsets from Base, seconds
      cuts: Vector[Int],
      redeliveries: Vector[(Int, Int)])

  private val tokenGen = Gen.oneOf("aa", "bb", "cc", "dd")
  private val caseGen: Gen[PCase] = for {
    n <- Gen.choose(3, 10)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 5) // 1-token texts have no shingle: None
      toks <- Gen.listOfN(len, tokenGen)
    } yield toks.mkString(" "))
    steps <- Gen.listOfN(n, Gen.oneOf(0L, 1L, 100L, 599L, 600L, 601L))
    nCuts <- Gen.choose(0, 3)
    cutPos <- Gen.listOfN(nCuts, Gen.choose(1, n - 1))
    nRe <- Gen.choose(0, 2)
    reIdx <- Gen.listOfN(nRe, Gen.choose(0, n - 1))
    reBatch <- Gen.listOfN(nRe, Gen.choose(0, nCuts))
  } yield PCase(texts.toVector,
    steps.scanLeft(0L)(_ + _).tail.toVector,
    cutPos.distinct.sorted.toVector,
    reIdx.zip(reBatch).toVector)

  /** Horizon-windowed batch reference: same signature function (its
    * own lockstep with the batch oracle is gate-pinned elsewhere —
    * the fuzz targets the BUCKET-STATE behavior across slicings).
    */
  private def reference(c: PCase): Seq[(Long, Long, Long, Double)] = {
    val rows = NumHashes / Bands
    val sigs = c.texts.map(t =>
      StreamDedup.minhashSignature(t, ShingleN, NumHashes))
    val out = for {
      j <- c.texts.indices
      i <- 0 until j
      si <- sigs(i).toSeq
      sj <- sigs(j).toSeq
      if (c.secs(j) - c.secs(i)) * 1000L <= HorizonMs
      shared = (0 until Bands).count(b =>
        si.slice(b * rows, (b + 1) * rows).mkString ==
          sj.slice(b * rows, (b + 1) * rows).mkString)
      if shared > 0
      est = si.zip(sj).count { case (x, y) => x == y }.toDouble / NumHashes
      if est >= Threshold
      _ <- 0 until shared // one emission per shared band
    } yield (i.toLong, j.toLong, Base + c.secs(j) * 1000L, est)
    out.sorted
  }

  test("property: time-ordered splits with in-horizon redeliveries emit the horizon-windowed batch pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    forAll(caseGen, n = 12) { c =>
      val docs = c.texts.indices.map(i => StreamDedup.Doc(
        i.toLong, new Timestamp(Base + c.secs(i) * 1000L),
        c.texts(i))).toVector
      val batches = sliceBatches(docs, c.cuts)
      // eligibility: redeliver ONLY while the doc is still inside the
      // horizon of everything seen so far (redelivery after eviction
      // is outside the operator's exactness domain)
      val withRe = withRedeliveries(batches, c.redeliveries,
        (d: StreamDedup.Doc, i: Int) => d.doc_id == i.toLong, docs(_),
        eligible = (i, bi) => batches.take(bi + 1).flatten
          .map(_.ts.getTime).max - docs(i).ts.getTime <= HorizonMs)
      val input = MemoryStream[StreamDedup.Doc]
      val sink = s"sdedup_fuzz_${System.nanoTime()}"
      // delay > horizon (the StreamAnnFuzzSpec rationale): ties at a
      // batch cut and redelivered old rows must reach the operator —
      // with "0 seconds" the ts <= watermark late-row filter dropped
      // them BEFORE the state guard under test; emission is
      // arrival-driven, so the delay changes nothing else
      val q = StreamDedup.candidatePairs(input.toDS(),
        shingleN = ShingleN, numHashes = NumHashes, bands = Bands,
        threshold = Threshold, watermarkDelay = "660 seconds",
        horizonMs = HorizonMs)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        withRe.foreach { b =>
          if (b.nonEmpty) { input.addData(b: _*); q.processAllAvailable() }
        }
        val got = spark.table(sink)
          .as[(Long, Long, Timestamp, Double)].collect()
          .map { case (a, b, ts, est) => (a, b, ts.getTime, est) }
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
