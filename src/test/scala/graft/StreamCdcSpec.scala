package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamCdc

/** CDC apply: forward-only composite versions, duplicate/stale
  * suppression across micro-batches, in-batch version ordering,
  * tied-major-version tiebreak, delete pass-through.
  */
class StreamCdcSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private type Ch = (Long, Long, Long, String, Double, String)

  test("applies increasing versions once; suppresses redelivery and stale updates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ch]
    val q = StreamCdc.applyChangelog(
      input.toDF().toDF("key", "ver", "sub", "op", "value", "payload"))
      .writeStream.format("memory").queryName("scdc")
      .outputMode("append").start()
    try {
      // batch 1: key 1 gets v2 then v1 OUT OF ORDER in one batch (the
      // in-batch sort applies v1 before v2); key 2 gets one upsert
      input.addData((1L, 2L, 0L, "U", 20.0, "b"),
        (1L, 1L, 0L, "U", 10.0, "a"), (2L, 5L, 0L, "U", 50.0, "e"))
      q.processAllAvailable()
      // batch 2: v2 re-delivered (dropped), stale v0 (dropped),
      // v3 delete applied; key 2 unchanged
      input.addData((1L, 2L, 0L, "U", 20.0, "b"),
        (1L, 0L, 0L, "U", 0.0, "z"), (1L, 3L, 0L, "D", 0.0, "d"))
      q.processAllAvailable()
      val got = spark.table("scdc").as[Ch].collect().toSet
      assert(got == Set(
        (1L, 1L, 0L, "U", 10.0, "a"), (1L, 2L, 0L, "U", 20.0, "b"),
        (1L, 3L, 0L, "D", 0.0, "d"), (2L, 5L, 0L, "U", 50.0, "e")))
    } finally q.stop()
  }

  test("tied major versions resolve by sub: later sub applies, stale sub suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ch]
    val q = StreamCdc.applyChangelog(
      input.toDF().toDF("key", "ver", "sub", "op", "value", "payload"))
      .writeStream.format("memory").queryName("scdc_tie")
      .outputMode("append").start()
    try {
      // one commit timestamp, two changes: both apply, in sub order
      input.addData((7L, 100L, 1L, "U", 1.0, "a"),
        (7L, 100L, 2L, "U", 2.0, "b"))
      q.processAllAvailable()
      // re-delivery at the same (ver, sub) and a stale smaller sub at
      // the tied ver (the poison-probe shape): both suppressed; a
      // strictly larger sub still applies
      input.addData((7L, 100L, 2L, "U", 2.0, "b"),
        (7L, 100L, 0L, "U", 99.0, "poison"),
        (7L, 100L, 3L, "U", 3.0, "c"))
      q.processAllAvailable()
      val got = spark.table("scdc_tie").as[Ch].collect().toSet
      assert(got == Set(
        (7L, 100L, 1L, "U", 1.0, "a"), (7L, 100L, 2L, "U", 2.0, "b"),
        (7L, 100L, 3L, "U", 3.0, "c")))
    } finally q.stop()
  }
}
