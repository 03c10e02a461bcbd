package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Property-fuzz of the stateful sessionize operator: random per-user
  * event sequences (inter-arrival gaps straddling the session gap,
  * including the exactly-at-gap boundary), split into random
  * TIME-ORDERED micro-batches, must emit exactly the sessions a
  * globally-sorted batch pass produces. Time-ordered slicing is the
  * operator's exactness domain (the sliced-gate guarantee); the
  * straggler/bridge divergence cases are pinned separately in
  * [[StreamingSpec]].
  */
class SessionizeFuzzSpec extends AnyFunSuite with PropHelpers {

  private lazy val spark = TestSpark.spark

  private val Gap = 1800L // seconds
  private val Base = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000

  private final case class PCase(
      times: Vector[Long],   // strictly increasing epoch seconds
      users: Vector[Long],   // same length, values in 1..nUsers
      cuts: Vector[Int])     // sorted batch cut positions

  private val caseGen: Gen[PCase] = for {
    n <- Gen.choose(2, 14)
    nUsers <- Gen.choose(1, 3)
    steps <- Gen.listOfN(n,
      Gen.oneOf(60L, 600L, 1500L, 1799L, 1800L, 1801L, 2400L, 7200L))
    users <- Gen.listOfN(n, Gen.choose(1L, nUsers.toLong))
    nCuts <- Gen.choose(0, 3)
    cutPos <- Gen.listOfN(nCuts, Gen.choose(1, n - 1))
  } yield {
    val times = steps.scanLeft(Base)(_ + _).tail.toVector
    PCase(times, users.toVector, cutPos.distinct.sorted.toVector)
  }

  /** Reference batch sessionization: per user, globally time-sorted,
    * split where the gap to the previous event exceeds Gap (merge at
    * exactly Gap — the operator's documented rule).
    */
  private def reference(c: PCase): Set[(Long, Long, Long, Long)] = {
    c.users.zip(c.times).groupBy(_._1).flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.foldLeft(Vector.empty[(Long, Long, Long)]) {
        case (acc, t) =>
          acc.lastOption match {
            case Some((st, en, k)) if t - en <= Gap =>
              acc.init :+ ((st, t, k + 1))
            case _ => acc :+ ((t, t, 1L))
          }
      }
      sessions.map { case (st, en, k) => (u, st, en, k) }
    }.toSet
  }

  test("property: time-ordered random batch splits reproduce the batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    forAll(caseGen, n = 20) { c =>
      val events = c.times.zip(c.users).zipWithIndex.map {
        case ((t, u), i) =>
          EventStream.Event(i.toLong, new Timestamp(t * 1000L), u,
            "view", 0.0)
      }
      val batches: Vector[Vector[EventStream.Event]] = {
        val bounds = (0 +: c.cuts :+ events.length).distinct.sorted
        bounds.sliding(2).map { w => events.slice(w(0), w(1)) }.toVector
          .filter(_.nonEmpty)
      }
      val input = MemoryStream[EventStream.Event]
      val sink = s"sess_fuzz_${System.nanoTime()}"
      val q = EventStream.sessionize(input.toDS(), gapSeconds = Gap,
        watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        batches.foreach { b =>
          input.addData(b: _*)
          q.processAllAvailable()
        }
        // two far-future sentinels flush every open session
        input.addData(EventStream.Event(Long.MaxValue,
          Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "s", 0.0))
        q.processAllAvailable()
        input.addData(EventStream.Event(Long.MaxValue - 1,
          Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "s2", 0.0))
        q.processAllAvailable()
        val got = spark.table(sink).filter(col("user_id") > 0)
          .select("user_id", "session_start", "session_end", "n_events")
          .as[(Long, Timestamp, Timestamp, Long)].collect()
          .map { case (u, st, en, k) =>
            (u, st.getTime / 1000L, en.getTime / 1000L, k) }.toSet
        val want = reference(c)
        assert(got == want,
          s"\ntimes=${c.times}\nusers=${c.users}\ncuts=${c.cuts}" +
            s"\ngot=$got\nwant=$want")
      } finally {
        q.stop()
        spark.catalog.dropTempView(sink)
      }
    }
  }
}
