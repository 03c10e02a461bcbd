package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamQuota

/** Property-fuzz of the per-key quota operator (the Sessionize/
  * IntervalJoin fuzz pattern): random event sequences with bucket
  * rolls, exact-boundary steps, multi-user interleavings AND
  * at-least-once redeliveries, split into random TIME-ORDERED
  * micro-batches, must admit exactly the batch oracle's first-k per
  * (user, bucket) over the DISTINCT events. Strictly increasing event
  * times per user define the exactness domain (a cut inside an
  * equal-timestamp run could deliver the tie out of id order, which
  * the in-batch sort cannot repair across batches — the gate feeds
  * hour-local batches for the same reason).
  */
class StreamQuotaFuzzSpec extends AnyFunSuite with PropHelpers {

  private lazy val spark = TestSpark.spark

  private val BucketNs = 600L * 1000000000L // 10-minute buckets
  private val K = 2

  private final case class PCase(
      times: Vector[Long],  // strictly increasing epoch seconds
      users: Vector[Long],
      cuts: Vector[Int],
      // (event index, batch index to redeliver it in)
      redeliveries: Vector[(Int, Int)])

  private val caseGen: Gen[PCase] = for {
    n <- Gen.choose(3, 14)
    nUsers <- Gen.choose(1, 2)
    // steps probe within-bucket runs, the exact 600 s boundary, and
    // multi-bucket jumps
    steps <- Gen.listOfN(n, Gen.oneOf(1L, 30L, 120L, 599L, 600L, 601L, 1500L))
    users <- Gen.listOfN(n, Gen.choose(1L, nUsers.toLong))
    nCuts <- Gen.choose(0, 4)
    cutPos <- Gen.listOfN(nCuts, Gen.choose(1, n - 1))
    nRe <- Gen.choose(0, 3)
    reIdx <- Gen.listOfN(nRe, Gen.choose(0, n - 1))
    reBatch <- Gen.listOfN(nRe, Gen.choose(0, nCuts))
  } yield {
    val times = steps.scanLeft(1000L)(_ + _).tail.toVector
    PCase(times, users.toVector, cutPos.distinct.sorted.toVector,
      reIdx.zip(reBatch).toVector)
  }

  /** Batch oracle: first k distinct events per (user, bucket) in
    * (ts, id) order — redeliveries are invisible to it by definition.
    */
  private def reference(c: PCase): Set[(Long, Long, Long)] =
    c.times.indices.map(i =>
      (c.users(i), c.times(i) * 1000000000L, i.toLong))
      .groupBy { case (u, ts, _) => (u, Math.floorDiv(ts, BucketNs)) }
      .values.flatMap(_.sortBy { case (_, ts, id) => (ts, id) }.take(K))
      .toSet

  test("property: time-ordered splits with redeliveries admit exactly the batch first-k per bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    forAll(caseGen, n = 15) { c =>
      val events = c.times.indices.map(i =>
        (c.users(i), c.times(i) * 1000000000L, i.toLong)).toVector
      val batches = sliceBatches(events, c.cuts)
      val withRe = withRedeliveries(batches, c.redeliveries,
        (e: (Long, Long, Long), i: Int) => e._3 == i.toLong, events(_))
      val input = MemoryStream[(Long, Long, Long)]
      val sink = s"quota_fuzz_${System.nanoTime()}"
      val q = StreamQuota.perUserHourly(
        input.toDF().toDF("user_id", "ts_ns", "event_id"),
        k = K, bucketNs = BucketNs)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        withRe.foreach { b =>
          if (b.nonEmpty) { input.addData(b: _*); q.processAllAvailable() }
        }
        val got = spark.table(sink)
          .as[(Long, Long, Long)].collect()
        // exactly-once: no admitted event may appear twice even under
        // redelivery
        assert(got.length == got.distinct.length,
          s"duplicate admissions\ntimes=${c.times}\nusers=${c.users}" +
            s"\ncuts=${c.cuts}\nre=${c.redeliveries}\ngot=${got.toSeq}")
        val want = reference(c)
        assert(got.toSet == want,
          s"\ntimes=${c.times}\nusers=${c.users}\ncuts=${c.cuts}" +
            s"\nre=${c.redeliveries}\ngot=${got.toSet}\nwant=$want")
      } finally {
        q.stop()
        spark.catalog.dropTempView(sink)
      }
    }
  }
}
