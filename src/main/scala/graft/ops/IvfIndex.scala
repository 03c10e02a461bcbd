package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vectors => MlVectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.VectorFunctions

/** IVF (inverted-file) ANN index with k-means-trained centroids —
  * the production variant of the fixed-centroid `q_ann_ivf` query.
  *
  * Build: train k-means (seeded, deterministic) on the embedding
  * column, assign every vector to its nearest centroid cell, persist
  * the assignment partitioned by cell. Search: score the query against
  * the k centroids (broadcast — k is tiny), take the `nprobe` nearest
  * cells, and scan only those cells' vectors with the native
  * [[graft.expr.DotProduct]] kernel.
  *
  * Scale: the corpus is touched once at build (one k-means pass set +
  * one assignment scan); per query, work is `nprobe/k` of the corpus,
  * met by a cell-equi-join — the shuffle key is the cell id.
  */
object IvfIndex {

  final case class Model(
      centroids: Array[(Int, Array[Double])],
      assigned: DataFrame /* vec_id, v (array<double>), nrm, cell */)

  private def vecCol(c: Column): Column =
    VectorFunctions.toDoubleArray(c)

  /** Per-group element-wise mean of embedding vectors — the centroid
    * primitive (domain/label centroids, IVF cell refresh = the k-means
    * M-step): posexplode to (group, pos, x) and aggregate per
    * (group, pos). Fully keyed — no per-group collect_list, no row
    * ever holds more than one element, partial aggregation combines
    * map-side — so a group of a billion vectors costs the same shuffle
    * row count (|groups| × dim) as a group of fifty. Returns
    * (groupCol, pos long, c double, n_vecs long).
    */
  def groupCentroids(
      df: DataFrame,
      groupCol: String,
      embeddingCol: String,
      exactMean: Boolean = false): DataFrame = {
    // exactMean: each term DECIMAL-cast before SUM, so the mean is
    // accumulation-order-independent (the q_pca_power / QualityModel
    // pattern). A plain double avg over an UNBOUNDED group (every
    // vector of a label) can straddle a round(…,6) boundary or the
    // ±0.0 split differently per engine once the group grows — the
    // hash-gated centroid queries pass true and their oracles mirror
    // the decimal sum; the index-internal refresh paths keep the
    // cheaper double avg (no cross-engine compare there).
    val mean =
      if (exactMean)
        sum(col("x").cast("decimal(28,14)")).cast("double") /
          count(lit(1)).cast("double")
      else avg(col("x"))
    df.select(col(groupCol),
        posexplode(vecCol(col(embeddingCol))).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg(mean.as("c"), count(lit(1)).as("n_vecs"))
      .select(col(groupCol), col("pos").cast("long").as("pos"),
        col("c"), col("n_vecs"))
  }

  /** Train centroids and assign the corpus. `df` needs (idCol, vecCol). */
  def build(
      df: DataFrame,
      idCol: String,
      embeddingCol: String,
      k: Int,
      seed: Long = 42L,
      handle: CacheHandle = null): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // ledger/handle-tracked like buildExact (the bare-persist rule)
    val base = CacheHandle.persistWith(handle,
      df.select(col(idCol).as("vec_id"),
          vecCol(col(embeddingCol)).as("v"))
        .withColumn("nrm", VectorFunctions.l2Norm(col("v")))
        // zero-norm (failed/OOV) embeddings are outside the cosine
        // domain — exclude them from the index like the oracle's
        // `WHERE nrm > 0`; cosOrFloor stays as a second guard
        .filter(col("nrm") > 0))

    val mlVecs = base.select(col("vec_id"), col("v"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) => (id, MlVectors.dense(v.toArray)) }
      .toDF("vec_id", "features")
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
    val model = km.fit(mlVecs)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }

    val assigned = CacheHandle.persistWith(handle,
      assignCells(centroids, base))
    // materialize the assignment WHILE base is still cached, then drop
    // base: the old order (unpersist base, assigned still lazy) threw
    // away the warm scan+norm and recomputed it on the caller's first
    // action over the assignment
    assigned.count()
    base.unpersist()
    Model(centroids, assigned)
  }

  /** Assign prepared vectors (vec_id, v, nrm) to `centroids` via the
    * same cosine scoring used at search time (not the euclidean
    * k-means metric — cells must match the query-time rule); ties
    * break to the lowest cell id. Shared by [[build]] and [[append]]
    * so batch and incremental assignment cannot diverge.
    */
  /** Cosine with a zero-norm guard: an all-zero vector (a failed or
    * OOV embedding) or a zero-sum centroid scores −2.0 — below every
    * real cosine — so it never wins a probe or neighbor slot,
    * DETERMINISTICALLY, instead of injecting NaN into the rankings
    * (double x/0.0 is NaN, and NaN sorts FIRST under desc, so an
    * unguarded zero-norm row would win every ordering it touched).
    */
  private def cosOrFloor(dot: Column, n1: Column, n2: Column): Column =
    when(n1 * n2 > 0, dot / (n1 * n2)).otherwise(lit(-2.0))

  private def assignCells(
      centroids: Array[(Int, Array[Double])],
      base: DataFrame): DataFrame = {
    val spark = base.sparkSession
    val centDf = spark.createDataFrame(
      centroids.toIndexedSeq.map { case (i, c) =>
        (i, c.toSeq, math.sqrt(c.map(x => x * x).sum))
      }).toDF("c_id", "cv", "cn")
      .select(col("c_id"), col("cv").cast("array<double>").as("cv"), col("cn"))
    val aw = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    base.join(broadcast(centDf))
      .withColumn("c_cos", cosOrFloor(
        VectorFunctions.dotProduct(col("v"), col("cv")),
        col("nrm"), col("cn")))
      .withColumn("rk", row_number().over(aw))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as("cell"))
  }

  /** [[build]]'s hash-gateable twin: exact-arithmetic Lloyd training
    * (the q_kmeans_exact discipline) instead of Spark-ML k-means, so a
    * SQL oracle can replay the trained quantizer step for step.
    * Determinism inventory: seeds are the `k` lowest ids (a k-row
    * LIMIT — bounded by construction, so the single-partition
    * row_number is k rows); every distance term and coordinate sum
    * crosses its aggregate as DECIMAL(28,14) (order-independent, and
    * doubles never sit exactly on decimal midpoints so both engines
    * round alike); assignment argmins compare exact decimals with an
    * id tiebreak; the one double division per mean coordinate is the
    * same IEEE op on both engines. `iters` is a fixed bounded round
    * count — each round is one keyed distance aggregate + one keyed
    * mean aggregate over the exploded (vec, dim) frame, all map-side
    * partial. The collected result is k × dim — constant-sized, the
    * permitted driver materialization — and feeds the same
    * [[assignCells]]/[[search]] path as the ML build, so the gate
    * covers the whole production search shape.
    */
  def buildExact(
      df: DataFrame,
      idCol: String,
      embeddingCol: String,
      k: Int,
      iters: Int = 2,
      handle: CacheHandle = null): Model = {
    // fail fast like the sibling round/size params (pageRank, kcore):
    // k=0 silently built an empty index, iters=0 returned the raw
    // seeds as "trained" centroids
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val base = CacheHandle.persistWith(handle,
      df.select(col(idCol).cast("long").as("vec_id"),
          vecCol(col(embeddingCol)).as("v"))
        .withColumn("nrm", VectorFunctions.l2Norm(col("v")))
        .filter(col("nrm") > 0)) // oracle domain: WHERE nrm > 0
    val ex = CacheHandle.persistWith(handle, base.select(col("vec_id"),
      posexplode(col("v")).as(Seq("pos", "x"))))
    val sw = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    val seeds = base.select("vec_id").orderBy("vec_id").limit(k)
      .select(col("vec_id"),
        (row_number().over(sw) - 1).cast("int").as("cid"))
    var cent = ex.join(seeds, "vec_id")
      .select(col("cid"), col("pos"), col("x").as("cx"))
    for (_ <- 1 to iters) {
      val d = ex.join(cent, "pos")
        .groupBy("vec_id", "cid")
        .agg(sum(((col("x") - col("cx")) * (col("x") - col("cx")))
          .cast("decimal(28,14)")).as("d"))
      val asg = d.groupBy("vec_id")
        .agg(min(struct(col("d"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
      cent = CacheHandle.persistWith(handle, ex.join(asg, "vec_id")
        .groupBy("cid", "pos")
        .agg((sum(col("x").cast("decimal(28,14)")).cast("double") /
          count(lit(1))).as("cx")))
    }
    val centroids = cent.orderBy("cid", "pos").collect()
      .groupBy(_.getInt(0)).toArray
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)))
      }
      .sortBy(_._1)
    val assigned =
      CacheHandle.persistWith(handle, assignCells(centroids, base))
    Model(centroids, assigned)
  }

  /** Assign new vectors with `model`'s centroids (no re-train). */
  def assign(
      model: Model,
      df: DataFrame,
      idCol: String,
      embeddingCol: String): DataFrame =
    assignCells(model.centroids,
      df.select(col(idCol).as("vec_id"),
        vecCol(col(embeddingCol)).as("v"))
        .withColumn("nrm", VectorFunctions.l2Norm(col("v")))
        .filter(col("nrm") > 0)) // oracle domain: WHERE nrm > 0

  /** Append already-assigned rows (vec_id, v, nrm, cell) to a saved
    * index's cell-partitioned layout. Append mode writes only the
    * touched cells' directories — index maintenance is incremental,
    * no rebuild, no rewrite of the existing corpus.
    */
  def appendAssigned(assigned: DataFrame, path: String): Unit =
    assigned
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/assigned")

  /** Incremental index maintenance: assign newly arrived vectors with
    * the SAVED centroids and append them to the layout at `path`. The
    * quantizer does not drift — re-train (and re-[[save]]) when the
    * cell-balance report (q_ivf_stats) degrades.
    */
  def append(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      newVecs: DataFrame,
      idCol: String,
      embeddingCol: String): Unit =
    appendAssigned(
      assign(load(spark, path), newVecs, idCol, embeddingCol), path)

  /** Persist a built index: centroids as one tiny parquet, the
    * assignment partitioned by cell — the index lifecycle at scale.
    * A 100 TB corpus is indexed once (or incrementally); queries run
    * against the SAVED index, and the cell-partitioned layout means a
    * probe scans only the probed cells' directories (partition
    * pruning / DPP on the cell equi-join), not the corpus.
    */
  def save(model: Model, path: String): Unit = {
    val spark = model.assigned.sparkSession
    spark.createDataFrame(
        model.centroids.toIndexedSeq.map { case (i, c) => (i, c.toSeq) })
      .toDF("c_id", "cv")
      .select(col("c_id"), col("cv").cast("array<double>").as("cv"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    model.assigned
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
  }

  /** Load a saved index. The assignment DataFrame is the partitioned
    * scan — [[search]] over it prunes to the probed cells.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val assigned = spark.read.parquet(s"$path/assigned")
      .select(col("vec_id"), col("v"), col("nrm"),
        col("cell").cast("int").as("cell"))
    Model(centroids, assigned)
  }

  /** Top-`topK` neighbors for each query vector, scanning `nprobe`
    * cells. `queries` needs (idCol, embeddingCol).
    */
  def search(
      model: Model,
      queries: DataFrame,
      idCol: String,
      embeddingCol: String,
      topK: Int = 10,
      nprobe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val q = queries.select(col(idCol).as("q_id"),
      vecCol(col(embeddingCol)).as("qv"))
      .withColumn("qn", VectorFunctions.l2Norm(col("qv")))
      .filter(col("qn") > 0) // oracle domain: WHERE nrm > 0
    val centDf = spark.createDataFrame(
      model.centroids.toIndexedSeq.map { case (i, c) =>
        (i, c.toSeq, math.sqrt(c.map(x => x * x).sum))
      }).toDF("c_id", "cv", "cn")
      .select(col("c_id"), col("cv").cast("array<double>").as("cv"), col("cn"))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("c_cos").desc, col("c_id"))
    val probed = q.join(broadcast(centDf))
      .withColumn("c_cos", cosOrFloor(
        VectorFunctions.dotProduct(col("qv"), col("cv")),
        col("qn"), col("cn")))
      .withColumn("rk", row_number().over(pw))
      .filter(col("rk") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"), col("c_id").as("cell"))
    val cand = model.assigned
      .select(col("vec_id").as("cand_id"), col("v").as("cv2"),
        col("nrm").as("cn2"), col("cell"))
    probed.join(cand, Seq("cell"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("score", cosOrFloor(
        VectorFunctions.dotProduct(col("qv"), col("cv2")),
        col("qn"), col("cn2")))
      .groupBy("q_id")
      .agg(graft.expr.TopKByScore.topK(col("score"), col("cand_id"), topK)
        .as("neighbors"))
  }
}
