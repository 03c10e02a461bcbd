package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamCdc

/** CDC apply: forward-only versions, duplicate/stale suppression
  * across micro-batches, in-batch version ordering, delete pass-through.
  */
class StreamCdcSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("applies increasing versions once; suppresses redelivery and stale updates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Double)]
    val q = StreamCdc.applyChangelog(
      input.toDF().toDF("key", "ver", "op", "value"))
      .writeStream.format("memory").queryName("scdc")
      .outputMode("append").start()
    try {
      // batch 1: key 1 gets v2 then v1 OUT OF ORDER in one batch (the
      // in-batch sort applies v1 before v2); key 2 gets one upsert
      input.addData((1L, 2L, "U", 20.0), (1L, 1L, "U", 10.0),
        (2L, 5L, "U", 50.0))
      q.processAllAvailable()
      // batch 2: v2 re-delivered (dropped), stale v0 (dropped),
      // v3 delete applied; key 2 unchanged
      input.addData((1L, 2L, "U", 20.0), (1L, 0L, "U", 0.0),
        (1L, 3L, "D", 0.0))
      q.processAllAvailable()
      val got = spark.table("scdc")
        .as[(Long, Long, String, Double)].collect().toSet
      assert(got == Set(
        (1L, 1L, "U", 10.0), (1L, 2L, "U", 20.0), (1L, 3L, "D", 0.0),
        (2L, 5L, "U", 50.0)))
    } finally q.stop()
  }
}
