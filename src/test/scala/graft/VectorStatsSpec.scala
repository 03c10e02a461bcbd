package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VectorStats

class VectorStatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("dimStats: hand-checked moments; zero-variance clamped not NaN") {
    import spark.implicits._
    val df = Seq(
      Array(1.0f, 5.0f, 2.0f),
      Array(3.0f, 5.0f, 4.0f)).toDF("embedding")
    val st = VectorStats.dimStats(df, "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(st(0L) == ((2L, 2.0, 1.0)))
    assert(st(1L)._2 == 5.0 && st(1L)._3 == 0.0) // constant dim: sd 0, not NaN
    assert(st(2L) == ((2L, 3.0, 1.0)))
  }

  test("standardize: z has ~zero mean and unit variance per kept dim") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val z = VectorStats.standardize(emb, "vec_id", "embedding")
    val stats = z.groupBy("pos")
      .agg(avg(col("z")).as("m"), avg(col("z") * col("z")).as("v"))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-9, s"mean off at pos ${r.get(0)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9, s"var off at pos ${r.get(0)}")
    }
  }

  test("standardize drops zero-variance dimensions") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 7.0f)), (2L, Array(3.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val kept = VectorStats.standardize(df, "vec_id", "embedding")
      .select("pos").distinct().collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L))
  }

  test("pcaPowerTop recovers a rank-one covariance direction exactly") {
    import spark.implicits._
    // points along u = (0.6, 0.8): centered scatter is 31.25·uuᵀ, so
    // one round already lands on ±u and the eigenvalue is 31.25
    val df = Seq(
      (1L, Array(3.0f, 4.0f)), (2L, Array(6.0f, 8.0f)),
      (3L, Array(-3.0f, -4.0f)), (4L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = VectorStats.pcaPowerTop(df, "vec_id", "embedding",
      rounds = 3).orderBy("i").collect()
    graft.ops.QueryCaches.releaseAll()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(got.map(_.getDouble(1)).toSeq == Seq(0.6, 0.8))
    assert(got.map(_.getDouble(2)).toSeq == Seq(31.25, 31.25))
  }
}
