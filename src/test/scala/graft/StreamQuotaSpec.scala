package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamQuota

/** Per-user quota: in-batch cap, cross-batch state carry, and the
  * period roll that resets the count.
  */
class StreamQuotaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ns(sec: Long): Long = sec * 1000000000L

  test("admits at most k per period; state carries; period rolls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamQuota.perUserHourly(
      input.toDF().toDF("user_id", "ts_ns", "event_id"),
      k = 2, bucketNs = ns(10))
      .writeStream.format("memory").queryName("squota")
      .outputMode("append").start()
    try {
      // batch 1: user 1 sends 3 events in period 0 (OUT OF ORDER —
      // the in-batch sort decides admission), user 2 sends 1
      input.addData((1L, ns(3), 30L), (1L, ns(1), 10L), (1L, ns(2), 20L),
        (2L, ns(1), 40L))
      q.processAllAvailable()
      // batch 2: user 1's period-0 budget is SPENT (state), so ts 5
      // drops; ts 12 opens period 1 and is admitted
      input.addData((1L, ns(5), 50L), (1L, ns(12), 60L))
      q.processAllAvailable()
      val got = spark.table("squota")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set(
        (1L, ns(1), 10L), (1L, ns(2), 20L), // first two of period 0
        (2L, ns(1), 40L),
        (1L, ns(12), 60L))) // period rolled, count reset
    } finally q.stop()
    intercept[IllegalArgumentException] {
      StreamQuota.perUserHourly(
        Seq((1L, 0L, 0L)).toDF("user_id", "ts_ns", "event_id"), k = 0)
    }
  }

  test("a stale-period late arrival cannot reset the live counter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamQuota.perUserHourly(
      input.toDF().toDF("user_id", "ts_ns", "event_id"),
      k = 2, bucketNs = ns(10))
      .writeStream.format("memory").queryName("squota_stale")
      .outputMode("append").start()
    try {
      // batch 1: period 1's budget is fully spent
      input.addData((1L, ns(11), 1L), (1L, ns(12), 2L))
      q.processAllAvailable()
      // batch 2: a LATE period-0 event, then another period-1 event.
      // The old `hour != state.hour` roll reset the counter on the
      // stale arrival, admitted it, reset AGAIN on the period-1 event
      // and re-admitted past k — the quota bypass. Now: the stale
      // event is dropped (its budget closed) and period 1 stays spent.
      input.addData((1L, ns(5), 3L), (1L, ns(13), 4L))
      q.processAllAvailable()
      val got = spark.table("squota_stale")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, ns(11), 1L), (1L, ns(12), 2L)))
    } finally q.stop()
  }

  test("an at-least-once redelivery of an admitted event neither re-emits nor burns quota") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamQuota.perUserHourly(
      input.toDF().toDF("user_id", "ts_ns", "event_id"),
      k = 2, bucketNs = ns(10))
      .writeStream.format("memory").queryName("squota_redeliver")
      .outputMode("append").start()
    try {
      // batch 1: one admitted event (n=1 of k=2)
      input.addData((1L, ns(11), 1L))
      q.processAllAvailable()
      // batch 2: the SAME event redelivered (at-least-once transport),
      // plus two new unique events. The old counter re-admitted the
      // duplicate (double emission) AND counted it, so the second
      // unique event was rejected with only one unique admission made.
      input.addData((1L, ns(11), 1L), (1L, ns(12), 2L), (1L, ns(13), 3L))
      q.processAllAvailable()
      val got = spark.table("squota_redeliver")
        .as[(Long, Long, Long)].collect().toSeq
      // exactly-once output: events 1 and 2 admitted once each, the
      // duplicate suppressed, event 3 rejected by the true quota
      assert(got.sortBy(_._3) == Seq((1L, ns(11), 1L), (1L, ns(12), 2L)),
        s"got=$got")
    } finally q.stop()
  }
}
