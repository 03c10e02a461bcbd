package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamGaps

/** Property-fuzz of the silence detector: random per-user event
  * sequences (gap-boundary steps, same-second ties ordered by id),
  * random time-ordered micro-batch cuts, random redeliveries — the
  * emitted gaps must equal the batch per-key lag pass, and a
  * redelivered (or tied) arrival must neither drag the frontier
  * backward nor emit a spurious gap.
  */
class StreamGapsFuzzSpec extends AnyFunSuite with PropHelpers {

  private lazy val spark = TestSpark.spark

  private val GapSec = 60L
  private val Base = 1700000000L // epoch seconds, far from 0

  private final case class PCase(
      secs: Vector[Long],
      users: Vector[Long],
      cuts: Vector[Int],
      redeliveries: Vector[(Int, Int)])

  private val caseGen: Gen[PCase] = for {
    n <- Gen.choose(3, 14)
    nUsers <- Gen.choose(1, 2)
    steps <- Gen.listOfN(n, Gen.oneOf(0L, 1L, 30L, 59L, 60L, 61L, 300L))
    users <- Gen.listOfN(n, Gen.choose(1L, nUsers.toLong))
    nCuts <- Gen.choose(0, 4)
    cutPos <- Gen.listOfN(nCuts, Gen.choose(1, n - 1))
    nRe <- Gen.choose(0, 3)
    reIdx <- Gen.listOfN(nRe, Gen.choose(0, n - 1))
    reBatch <- Gen.listOfN(nRe, Gen.choose(0, nCuts))
  } yield PCase(steps.scanLeft(Base)(_ + _).tail.toVector,
    users.toVector, cutPos.distinct.sorted.toVector,
    reIdx.zip(reBatch).toVector)

  /** Batch oracle: per user, sort by (sec, id), lag diffs > GapSec. */
  private def reference(c: PCase): Set[(Long, Long, Long, Long)] =
    c.secs.indices.map(i => (c.users(i), c.secs(i), i.toLong))
      .groupBy(_._1).flatMap { case (u, evs) =>
        evs.sortBy(e => (e._2, e._3)).sliding(2).collect {
          case Seq((_, s0, _), (_, s1, _)) if s1 - s0 > GapSec =>
            (u, s0, s1, s1 - s0)
        }
      }.toSet

  test("property: time-ordered splits with redeliveries emit exactly the batch lag gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    forAll(caseGen, n = 15) { c =>
      val events = c.secs.indices.map(i =>
        (c.users(i), c.secs(i) * 1000000000L, i.toLong)).toVector
      val batches = sliceBatches(events, c.cuts)
      val withRe = withRedeliveries(batches, c.redeliveries,
        (e: (Long, Long, Long), i: Int) => e._3 == i.toLong, events(_))
      val input = MemoryStream[(Long, Long, Long)]
      val sink = s"gaps_fuzz_${System.nanoTime()}"
      val q = StreamGaps.detectGaps(
        input.toDF().toDF("user_id", "ts_ns", "event_id"), GapSec)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        withRe.foreach { b =>
          if (b.nonEmpty) { input.addData(b: _*); q.processAllAvailable() }
        }
        val got = spark.table(sink)
          .as[(Long, Long, Long, Long)].collect()
        assert(got.length == got.distinct.length,
          s"duplicate gap\ncase=$c\ngot=${got.toSeq}")
        assert(got.toSet == reference(c),
          s"\ncase=$c\ngot=${got.toSet}\nwant=${reference(c)}")
      } finally {
        q.stop()
        spark.catalog.dropTempView(sink)
      }
    }
  }
}
