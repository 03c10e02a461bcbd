package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CosineLsh
import graft.streaming.StreamAnn
import graft.streaming.StreamAnn.Vec

/** Streaming embedding near-dup: planted look-alike vectors must pair
  * as they arrive, zero-norm vectors never match, horizon-expired
  * vectors stop matching, and the bucket function must agree with the
  * batch CosineLsh column (same planes, same sign convention).
  */
class StreamAnnSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val dim = 8
  private def unit(i: Int, eps: Double = 0.0): Seq[Double] =
    Seq.tabulate(dim)(d => (if (d == i) 1.0 else 0.0) + eps * d)

  test("planted look-alikes pair; orthogonal and zero vectors do not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val q = StreamAnn.candidatePairs(input.toDS(),
      k = 4, dim = dim, threshold = 0.9)
      .writeStream.format("memory").queryName("sann")
      .outputMode("append").start()
    try {
      input.addData(
        Vec(0L, ts(0), unit(0)),
        Vec(1L, ts(1), unit(0, eps = 0.001)), // ~identical to 0
        Vec(2L, ts(2), unit(4)),              // orthogonal
        Vec(3L, ts(3), Seq.fill(dim)(0.0)))   // zero norm: skipped
      q.processAllAvailable()
      val pairs = spark.table("sann").select("a", "b")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 1L)))
      assert(!pairs.exists { case (a, b) => a == 2L || b == 2L || b == 3L })
    } finally q.stop()
  }

  test("re-delivered vectors neither re-emit pairs nor grow state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val q = StreamAnn.candidatePairs(input.toDS(),
      k = 4, dim = dim, threshold = 0.9)
      .writeStream.format("memory").queryName("sann_d")
      .outputMode("append").start()
    try {
      input.addData(Vec(0L, ts(0), unit(0)))
      q.processAllAvailable()
      input.addData(Vec(1L, ts(1), unit(0, eps = 0.001)))
      q.processAllAvailable()
      // at-least-once re-delivery of vector 0: without the state-side
      // vec_id dedup this re-emits every qualifying pair of 0
      input.addData(Vec(0L, ts(2), unit(0)))
      q.processAllAvailable()
      val rows = spark.table("sann_d").select("a", "b")
        .as[(Long, Long)].collect().toSeq
      assert(rows == Seq((0L, 1L)),
        s"expected exactly one (0,1) pair, got $rows")
    } finally q.stop()
  }

  test("vectors past the horizon stop matching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Vec]
    val q = StreamAnn.candidatePairs(input.toDS(),
      k = 4, dim = dim, threshold = 0.9,
      watermarkDelay = "10 minutes", horizonMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sann_h")
      .outputMode("append").start()
    try {
      input.addData(Vec(0L, ts(0), unit(0)))
      q.processAllAvailable()
      // 30 minutes later — the original fell out of the horizon
      input.addData(Vec(9L, ts(30), unit(0, eps = 0.001)))
      q.processAllAvailable()
      assert(spark.table("sann_h").count() == 0)
    } finally q.stop()
  }

  test("bucketOf agrees with the batch CosineLsh bucket column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val planes = CosineLsh.planes(k = 4, dim = dim)
    val vecs = Seq.tabulate(dim)(i => (i.toLong, unit(i, eps = 0.01)))
    val batch = vecs.toDF("id", "v")
      .select(col("id"), CosineLsh.bucketCol(col("v"), planes).as("b"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(StreamAnn.bucketOf(v, planes) == batch(id),
        s"bucket mismatch for vector $id")
    }
  }
}
