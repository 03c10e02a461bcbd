package graft.ops

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.VectorFunctions

/** Random-hyperplane LSH for cosine similarity (the production variant
  * of the axis-plane `q_ann_bucketed` query).
  *
  * Planes are Rademacher vectors (entries ±1) drawn deterministically
  * from a seed — `sign(h(seed, plane, dim))` — so signatures are
  * reproducible across sessions and retries with no stored model.
  * For unit-norm-agnostic cosine hashing, `P[bit differs] = θ/π`:
  * k bits give a bucket whose collision probability rises steeply with
  * similarity. Buckets are the shuffle key; search joins bucket-local
  * candidates only.
  *
  * Each signature bit is one native [[graft.expr.DotProduct]] against a
  * literal plane (codegen'd); k planes = k dot products per row, one
  * corpus pass.
  */
object CosineLsh {

  /** ±1 plane matrix, deterministic in (seed, k, dim). */
  // productHash is pinned despite its deprecation: the q_ann_lsh /
  // q_cosine_pairs_lsh oracles carry these planes as literals, and the
  // suggested caseClassHash mixes differently — changing the hash
  // silently changes every plane
  @scala.annotation.nowarn("cat=deprecation")
  def planes(k: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(k) { p =>
      Array.tabulate(dim) { d =>
        val h = MurmurHash3.productHash((seed, p, d))
        if ((h & 1) == 0) 1.0 else -1.0
      }
    }

  /** Bucket column: k sign bits of the plane dot products. `v` must be
    * array<double> (use [[VectorFunctions.toDoubleArray]]).
    */
  def bucketCol(v: Column, planeMatrix: Array[Array[Double]]): Column =
    planeMatrix.zipWithIndex.map { case (plane, p) =>
      val planeLit = array(plane.toIndexedSeq.map(lit): _*)
      when(VectorFunctions.dotProduct(v, planeLit) >= 0d, lit(1 << p))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Corpus bucketization: adds `bucket` (and keeps a normalized double
    * vector + norm for downstream scoring).
    */
  def bucketize(
      df: DataFrame,
      idCol: String,
      embeddingCol: String,
      k: Int = 8,
      seed: Long = 42L,
      dim: Int = -1): DataFrame = {
    // pass `dim` to skip the inference action (one driver job per
    // call); the inference head() throws on an empty frame or a null
    // first embedding — fail with a clear message instead
    val d =
      if (dim > 0) dim
      else {
        val row = df.select(size(col(embeddingCol))).limit(1).collect()
        require(row.nonEmpty && !row.head.isNullAt(0),
          s"cannot infer dim from an empty frame or null $embeddingCol — " +
            "pass dim explicitly")
        row.head.getInt(0)
      }
    val pm = planes(k, d, seed)
    df.select(col(idCol).as("vec_id"),
      VectorFunctions.toDoubleArray(col(embeddingCol)).as("v"))
      .withColumn("nrm", VectorFunctions.l2Norm(col("v")))
      .withColumn("bucket", bucketCol(col("v"), pm))
  }
}
