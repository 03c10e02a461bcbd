package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CosineLsh

class CosineLshSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("planes are deterministic in the seed and ±1-valued") {
    val a = CosineLsh.planes(4, 8, seed = 7L)
    val b = CosineLsh.planes(4, 8, seed = 7L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(x => x == 1.0 || x == -1.0))
    val c = CosineLsh.planes(4, 8, seed = 8L)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
  }

  test("bucketize is stable across runs and spreads the corpus") {
    val emb = Tables.table(spark, dir, "embeddings")
    val b1 = CosineLsh.bucketize(emb, "vec_id", "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = CosineLsh.bucketize(emb, "vec_id", "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == b2)
    val distinct = b1.values.toSet.size
    assert(distinct > 10, s"only $distinct buckets used for 50 vectors")
  }

  test("positive scaling never changes a vector's bucket") {
    val emb = Tables.table(spark, dir, "embeddings")
    val scaled = emb.withColumn("embedding",
      transform(col("embedding"), x => x * lit(3.5f)))
    val orig = CosineLsh.bucketize(emb, "vec_id", "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val after = CosineLsh.bucketize(scaled, "vec_id", "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(orig == after) // cosine hashing is scale-invariant
  }
}
