package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.Doc

/** Streaming near-dup detection: planted duplicates must pair as they
  * arrive, distinct documents must not, and the streamed candidate set
  * must agree with the batch twin over the same signature function.
  */
class StreamDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val corpus = Seq(
    (0L, base),
    (1L, base), // exact dupe of 0
    (2L, base + " extra"), // near dupe (one appended token)
    (3L, "completely different words about spark query engines and data"),
    (5L, "another unrelated document mentioning clusters and shuffles only"))

  test("streaming minhash pairs planted dupes as they arrive, not distinct docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.candidatePairs(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // docs arrive one minute apart, all within the horizon
      input.addData(corpus.zipWithIndex.map { case ((id, text), i) =>
        Doc(id, ts(i), text)
      }: _*)
      q.processAllAvailable()
      val pairs = spark.table("sdedup")
        .select("a", "b", "est_jaccard").distinct()
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, e) => (a, b) -> e }.toMap
      assert(pairs.get((0L, 1L)).contains(1.0)) // exact dupe: 6/6 match
      assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
      assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
      assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L })
    } finally q.stop()
  }

  test("idle buckets are removed wholesale once the watermark passes the horizon") {
    // the 100 TB property behind hasTimedOut/state.remove(): an idle
    // bucket's state must VANISH from the store, not merely stop
    // matching — otherwise state grows with every bucket ever touched
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.candidatePairs(input.toDS(), threshold = 0.5,
      watermarkDelay = "0 seconds", horizonMs = 60_000L)
      .writeStream.format("memory").queryName("sdedup_timeout")
      .outputMode("append").start()
    try {
      def stateRows: Long =
        Option(q.lastProgress).map(_.stateOperators(0).numRowsTotal)
          .getOrElse(0L)
      input.addData(corpus.map { case (id, text) => Doc(id, ts(0), text) }: _*)
      q.processAllAvailable()
      val populated = stateRows
      assert(populated > 0, "expected per-bucket state after batch 1")
      // a far-future doc advances the watermark well past every
      // bucket's (maxTs + horizon) timeout; two batches so the
      // watermark computed at the END of the first is APPLIED in the
      // second, firing the timeouts
      input.addData(Doc(90L, ts(30), "totally fresh unrelated text now"))
      q.processAllAvailable()
      input.addData(Doc(91L, ts(31), "and one more to sweep the timers"))
      q.processAllAvailable()
      assert(stateRows < populated,
        s"idle buckets not removed: $populated -> $stateRows")
    } finally q.stop()
  }

  test("documents beyond the horizon no longer pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamDedup.candidatePairs(input.toDS(), threshold = 0.5,
      watermarkDelay = "5 minutes", horizonMs = 5 * 60 * 1000L)
      .writeStream.format("memory").queryName("shorizon")
      .outputMode("append").start()
    try {
      input.addData(Doc(0L, ts(0), base))
      q.processAllAvailable()
      // the duplicate arrives 20 minutes later — outside the horizon
      input.addData(Doc(1L, ts(20), base))
      q.processAllAvailable()
      assert(spark.table("shorizon").isEmpty)
      // but a fresh duplicate inside the horizon still pairs
      input.addData(Doc(2L, ts(22), base))
      q.processAllAvailable()
      val pairs = spark.table("shorizon").select("a", "b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)))
    } finally q.stop()
  }

  test("streamed candidate set equals the batch twin over the same signatures") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = StreamDedup.candidatePairsBatch(
      corpus.toDF("doc_id", "text"), threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val input = MemoryStream[Doc]
    val q = StreamDedup.candidatePairs(input.toDS(), threshold = 0.5)
      .writeStream.format("memory").queryName("sparity")
      .outputMode("append").start()
    try {
      input.addData(corpus.zipWithIndex.map { case ((id, text), i) =>
        Doc(id, ts(i), text)
      }: _*)
      q.processAllAvailable()
      val streamed = spark.table("sparity").select("a", "b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }
}
