package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.VectorFunctions

/** Semantic deduplication over an embedding column (the SemDeDup
  * recipe): assign every vector to a coarse cluster cell, mine
  * near-duplicate pairs *within cells only*, and keep one
  * representative per near-dup group. Textually different documents
  * that embed almost identically (templated pages, translations,
  * paraphrases) are exactly what the fingerprint family
  * ([[TextDedup]]) cannot catch.
  *
  * Scale stance: the centroid set is tiny and broadcast, so cell
  * assignment is a shuffle-free projection over the corpus; pair
  * mining shuffles once on the cell id and is cell-local — O(Σ m_c²)
  * instead of O(n²), the same bucket-bounding idea as LSH banding
  * (and like there, a skew-prone cell can be capped via
  * [[TextDedup.capBuckets]]-style sub-division before mining).
  *
  * Column contract (mirrors [[graft.queries.VectorQueries]]): vectors
  * carry `(id, v: array<double>, nrm)` with zero-norm rows already
  * dropped; centroids carry `(c_id, cv, cn)`. Cosines are rounded to
  * 6 decimals before any comparison so the keep/drop decision is
  * reproducible cross-engine (the oracle hash-compares it).
  */
object SemanticDedup {

  private def cosR(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column,
      na: org.apache.spark.sql.Column,
      nb: org.apache.spark.sql.Column) =
    VectorFunctions.cosineSimilarityRounded(a, b, na, nb)

  /** Nearest-centroid cell per vector (rounded cosine, ties broken by
    * the smaller centroid id — a total order, so assignment is
    * deterministic). Broadcast join: no shuffle of the vector side.
    */
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("c_cos").desc, col("c_id"))
    vectors.join(broadcast(centroids))
      .withColumn("c_cos", cosR(col("v"), col("cv"), col("nrm"), col("cn")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("id"), col("v"), col("nrm"), col("c_id").as("cell"))
  }

  /** The kept set after within-cell near-dup pruning: for every pair
    * (a < b) in the same cell with rounded cosine ≥ `tau`, drop the
    * larger id — i.e. keep a document iff no smaller same-cell
    * document sits within `tau` of it. One representative (the
    * smallest id) survives per near-dup group, matching the exact
    * dedup family's keep-min rule.
    *
    * SCALE CONTRACT: within-cell mining is O(Σ m_c²) — bounded only
    * if cell sizes are. The centroid count must GROW with the corpus
    * (SemDeDup trains k so cells hold thousands, not n/k-of-everything
    * — a fixed tiny k over 100 TB is quadratic). `maxCellSize` is the
    * backstop for the skewed/mis-trained cell: over-cap cells are
    * sub-sharded by id hash ([[TextDedup.subBandBuckets]]) so per-cell
    * work stays O(maxCellSize²) per shard. Recall trade: cross-shard
    * pairs inside a mega-cell are not mined, so a near-dup group
    * split across shards keeps one representative PER SHARD — same
    * accepted loss as [[TextDedup.lshCandidatesSubBanded]]. The gates
    * run uncapped (`Int.MaxValue`, exact); q_semantic_dedup_capped
    * runs the capped plan under a provably drop-free cap against the
    * same oracle.
    *
    * `assigned` is read by both self-join sides and the anti-join, so
    * it is persisted here (pass a [[CacheHandle]] to own the
    * lifecycle).
    */
  def keepSet(
      assigned: DataFrame,
      tau: Double,
      handle: CacheHandle = null,
      maxCellSize: Int = Int.MaxValue): DataFrame = {
    val ap = CacheHandle.persistWith(handle, assigned)
    val sharded =
      if (maxCellSize == Int.MaxValue) ap
      else TextDedup.subBandBuckets(ap, Seq("cell"), "id", maxCellSize)
    val shardKey: Seq[org.apache.spark.sql.Column] =
      if (maxCellSize == Int.MaxValue) Nil else Seq(col("__shard"))
    val a = sharded.select((Seq(col("id").as("a"), col("v").as("va"),
      col("nrm").as("na"), col("cell")) ++ shardKey): _*)
    val b = sharded.select((Seq(col("id").as("b"), col("v").as("vb"),
      col("nrm").as("nb"), col("cell").as("bcell")) ++
      shardKey.map(_.as("bshard"))): _*)
    val pairCond = col("cell") === col("bcell") && col("a") < col("b") &&
      (if (maxCellSize == Int.MaxValue) lit(true)
       else col("__shard") === col("bshard"))
    val dropped = a
      .join(b, pairCond)
      .withColumn("cos_r", cosR(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos_r") >= tau)
      .select(col("b").as("id")).distinct()
    ap.select(col("id"), col("cell"))
      .join(dropped, Seq("id"), "left_anti")
  }
}
