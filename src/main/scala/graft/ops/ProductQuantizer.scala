package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.VectorFunctions

/** Product quantization for embedding columns — the memory-side scale
  * path for ANN beyond [[IvfIndex]]'s partitioning: each vector is
  * split into `subspaces` contiguous `subDim`-dim slices and every
  * slice is replaced by the id of its nearest codebook centroid, so a
  * 64-dim float vector compresses to `subspaces` small codes and
  * asymmetric distances can be served from per-query lookup tables.
  *
  * The codebook is hash-seeded and fully deterministic: the `k` seed
  * vectors are the rows with the smallest (md5("pq:"+id), id) — the
  * standard random-init made reproducible, the same device as the
  * IVF seeding — so assignments are oracle-checkable (no EM/k-means
  * refinement here; [[IvfIndex]] owns the iterative path and the
  * rows-only gate that goes with it).
  *
  * Scale stance: the codebook is `k` rows by LIMIT — bounded by
  * construction, so its broadcast is valid under the hint rule; the
  * assignment is a broadcast join + map-side min-struct aggregate
  * (one exchange of |V|·subspaces rows, no window sort); distances
  * use the codegen'd dot-product expression with the fixed
  * association (aa − 2ab) + bb mirrored in the oracle.
  */
object ProductQuantizer {

  private def subSlice(v: Column, s: Column, subDim: Int): Column =
    slice(v, s * subDim + 1, lit(subDim))

  /** Squared distance with the fixed association the oracles mirror. */
  private def sqDist(a: Column, b: Column): Column =
    (VectorFunctions.dotProduct(a, a) -
      lit(2.0) * VectorFunctions.dotProduct(a, b)) +
      VectorFunctions.dotProduct(b, b)

  /** Hash-seeded codebook exploded per subspace: (cid, sub, cs). */
  private def codebookSlices(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      subspaces: Int,
      subDim: Int,
      k: Int): DataFrame =
    embs
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .orderBy(md5(concat(lit("pq:"), col("cid").cast("string"))), col("cid"))
      .limit(k)
      .select(col("cid"),
        explode(sequence(lit(0), lit(subspaces - 1))).as("sub"),
        col("cv"))
      .select(col("cid"), col("sub"),
        subSlice(col("cv"), col("sub"), subDim).as("cs"))

  /** Per-(vector, subspace) code assignment:
    * (idCol, sub, code, dist_r) — `code` is the seed id of the nearest
    * centroid slice (ties → smallest id), `dist_r` the rounded squared
    * distance. `vecCol` must already be array<double>.
    */
  def pqCodes(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      subspaces: Int,
      subDim: Int,
      k: Int): DataFrame = {
    require(subspaces >= 1 && subDim >= 1 && k >= 1,
      s"need positive subspaces/subDim/k, got $subspaces/$subDim/$k")
    pqCodesFrom(codebookSlices(embs, idCol, vecCol, subspaces, subDim, k),
      embs, idCol, vecCol, subspaces, subDim)
  }

  /** [[pqCodes]] over an already-built (possibly shared/persisted)
    * codebook — [[adcTopK]] reuses one codebook for the assignment
    * AND the lookup table instead of running the corpus-wide
    * TakeOrdered seed pass twice.
    */
  private def pqCodesFrom(
      ce: DataFrame,
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      subspaces: Int,
      subDim: Int): DataFrame = {
    val ve = embs
      .select(col(idCol),
        explode(sequence(lit(0), lit(subspaces - 1))).as("sub"),
        col(vecCol).as("__v"))
      .select(col(idCol), col("sub"),
        subSlice(col("__v"), col("sub"), subDim).as("vs"))
    ve.join(broadcast(ce), "sub")
      .withColumn("dist", sqDist(col("vs"), col("cs")))
      .groupBy(col(idCol), col("sub"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col(idCol), col("sub").cast("long").as("sub"),
        col("m.cid").as("code"),
        // + 0.0: the squared distance is cancellation-prone ((aa−2ab)
        // + bb) and lands AT zero for a vector equal to its centroid
        // slice — the computed-zero normalization rule
        (round(col("m.dist"), 6) + lit(0.0)).as("dist_r"))
  }

  /** Asymmetric-distance (ADC) top-k search over the PQ codes: the
    * query stays a FULL vector, the database stays codes, and the
    * approximate squared distance is the sum over subspaces of the
    * query-slice→assigned-centroid-slice distances — served from a
    * per-query lookup table of `subspaces × k` entries (broadcast —
    * bounded by construction), never from the raw database vectors.
    * The query vector is excluded from both database and codebook.
    * Output: (idCol, adist_r), the `topK` nearest by
    * (rounded distance, id) — rounded BEFORE ranking so the cut line
    * is ulp-stable cross-engine.
    */
  def adcTopK(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      queryId: Long,
      subspaces: Int,
      subDim: Int,
      k: Int,
      topK: Int,
      handle: CacheHandle = null): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val base = embs.filter(col(idCol) =!= queryId)
    // ONE codebook for assignment + LUT (was two corpus-wide
    // TakeOrdered seed passes), persisted and eagerly materialized:
    // broadcast(ce) and broadcast(lut) run as separate concurrent
    // driver jobs and would otherwise race the lazy cache
    val ce = CacheHandle.persistWith(handle,
      codebookSlices(base, idCol, vecCol, subspaces, subDim, k))
    ce.count()
    val codes = pqCodesFrom(ce, base, idCol, vecCol, subspaces, subDim)
    val q = embs.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    val lut = ce.crossJoin(broadcast(q))
      .select(col("sub").cast("long").as("sub"), col("cid"),
        sqDist(subSlice(col("qv"), col("sub"), subDim), col("cs")).as("ad"))
    codes.join(broadcast(lut),
        codes("sub") === lut("sub") && codes("code") === lut("cid"))
      .groupBy(col(idCol))
      // + 0.0: same computed-zero guard as dist_r (a query sitting on
      // its reconstruction hashes -0.0 vs 0.0 across engines)
      .agg((round(sum(col("ad")), 6) + lit(0.0)).as("adist_r"))
      .orderBy(col("adist_r"), col(idCol))
      .limit(topK)
  }
}
