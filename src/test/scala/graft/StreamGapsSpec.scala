package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamGaps

/** Streaming silence detection: gaps close on the arriving event, the
  * per-key state carries across micro-batches, and within-batch
  * arrival order does not matter.
  */
class StreamGapsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ns(sec: Long): Long = sec * 1000000000L

  test("gaps are detected within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamGaps.detectGaps(
      input.toDF().toDF("user_id", "ts_ns", "event_id"), gapSeconds = 10)
      .writeStream.format("memory").queryName("sgaps")
      .outputMode("append").start()
    try {
      // batch 1: user 1 OUT OF ORDER (105 before 100) — the in-batch
      // sort must pair them correctly; user 2 has a single event
      input.addData((1L, ns(105), 2L), (1L, ns(100), 1L), (2L, ns(200), 3L))
      q.processAllAvailable()
      // batch 2: user 1 resumes 25 s after its batch-1 tail (gap,
      // via state), user 2 resumes 5 s later (no gap)
      input.addData((1L, ns(130), 4L), (2L, ns(205), 5L))
      q.processAllAvailable()
      val got = spark.table("sgaps")
        .select("user_id", "gap_start_s", "gap_end_s", "gap_sec")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 105L, 130L, 25L)))
    } finally q.stop()
  }

  test("a cross-batch late arrival cannot drag the frontier backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamGaps.detectGaps(
      input.toDF().toDF("user_id", "ts_ns", "event_id"), gapSeconds = 150)
      .writeStream.format("memory").queryName("sgaps_back")
      .outputMode("append").start()
    try {
      input.addData((1L, ns(1000), 1L))
      q.processAllAvailable()
      // batch 2: a LATE event older than the stored frontier, then a
      // frontier event. The old state overwrite emitted a spurious
      // (100, 1200) gap and swallowed the real (1000, 1200) one.
      input.addData((1L, ns(100), 2L), (1L, ns(1200), 3L))
      q.processAllAvailable()
      val got = spark.table("sgaps_back")
        .select("gap_start_s", "gap_end_s", "gap_sec")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1000L, 1200L, 200L)))
    } finally q.stop()
  }

  test("a late-but-next event still closes the gap (NoTimeout state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamGaps.detectGaps(
      input.toDF().toDF("user_id", "ts_ns", "event_id"), gapSeconds = 10)
      .writeStream.format("memory").queryName("sgaps_late")
      .outputMode("append").start()
    try {
      input.addData((7L, ns(0), 1L))
      q.processAllAvailable()
      // many batches later — state must still remember second 0
      input.addData((7L, ns(1000000), 2L))
      q.processAllAvailable()
      val got = spark.table("sgaps_late")
        .select("gap_start_s", "gap_end_s", "gap_sec")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == Seq((0L, 1000000L, 1000000L)))
    } finally q.stop()
  }
}
