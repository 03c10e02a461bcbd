package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SemanticDedup

class SemanticDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "v")
      .withColumn("nrm", graft.expr.VectorFunctions.l2Norm(col("v")))

  // two orthogonal centroids
  private val centroids = frame(Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(0.0, 1.0, 0.0))))
    .select(col("id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))

  test("assignCells picks the nearest centroid deterministically") {
    val vecs = frame(Seq(
      (10L, Seq(0.9, 0.1, 0.0)), // cell 0
      (11L, Seq(0.1, 0.9, 0.0)), // cell 1
      (12L, Seq(0.7, 0.7, 0.0)))) // exact tie → smaller c_id (0)
    val cells = SemanticDedup.assignCells(vecs, centroids)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(cells == Map(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("keepSet drops the larger id of each within-cell near-dup pair " +
    "and keeps cross-cell look-alikes") {
    val vecs = frame(Seq(
      (10L, Seq(0.9, 0.1, 0.0)),   // cell 0
      (11L, Seq(0.9, 0.1, 0.001)), // cell 0, ~identical to 10 → dropped
      (12L, Seq(0.0, 1.0, 0.2)),   // cell 1
      (13L, Seq(0.05, 1.0, 0.2)),  // cell 1, ~identical to 12 → dropped
      (14L, Seq(1.0, 0.0, -0.9)))) // cell 0, far from everything → kept
    val assigned = SemanticDedup.assignCells(vecs, centroids)
    val h = new graft.ops.CacheHandle
    val kept = SemanticDedup.keepSet(assigned, tau = 0.99, handle = h)
      .select("id").as[Long].collect().sorted.toSeq
    h.release()
    assert(kept == Seq(10L, 12L, 14L))

    // the cell-local approximation, documented by pinning it: a pair
    // split across cells is NOT examined, even above tau — that recall
    // loss is the price of never mining pairs across cells (SemDeDup's
    // trade; more centroids or multi-probe assignment narrows it)
    val split = frame(Seq(
      (20L, Seq(0.71, 0.70, 0.0)), // lands cell 0
      (21L, Seq(0.70, 0.71, 0.0)))) // lands cell 1, cosine ~0.9998
    val keptSplit = SemanticDedup.keepSet(
      SemanticDedup.assignCells(split, centroids), tau = 0.99)
      .select("id").as[Long].collect().sorted.toSeq
    assert(keptSplit == Seq(20L, 21L))
  }

  test("maxCellSize sub-shards a mega-cell: bounded work, intra-shard pairs survive") {
    // 6 near-identical vectors in ONE cell; cap 3 → 2 shards. The
    // uncapped fold keeps only the smallest id; under the cap each
    // SHARD keeps its own min (the documented cross-shard recall
    // trade) — so the kept set is larger but every shard still dedups.
    val vecs = frame(Seq.tabulate(6)(i =>
      (10L + i, Seq(0.9, 0.1, 0.0001 * i))))
    val assigned = SemanticDedup.assignCells(vecs, centroids)
    val h = new graft.ops.CacheHandle
    val exact = SemanticDedup.keepSet(assigned, tau = 0.99, handle = h)
      .select("id").as[Long].collect().sorted.toSeq
    val capped = SemanticDedup.keepSet(assigned, tau = 0.99, handle = h,
      maxCellSize = 3)
      .select("id").as[Long].collect().sorted.toSeq
    h.release()
    assert(exact == Seq(10L))
    // shards are id-hash-determined (ceil(6/3) = 2 of them); each
    // non-empty shard keeps exactly its smallest id
    val expected = vecs.select(col("id"),
      pmod(xxhash64(col("id")), lit(2L)).as("sh"))
      .as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).min).toSeq.sorted
    assert(capped == expected, s"capped=$capped expected=$expected")
    // a generous cap (> every cell) is provably drop-free: shard 0
    // everywhere, identical result through the sub-shard machinery
    val cappedBig = SemanticDedup.keepSet(assigned, tau = 0.99,
      handle = h, maxCellSize = 100)
      .select("id").as[Long].collect().sorted.toSeq
    assert(cappedBig == exact)
  }

  test("pair mining is cell-local: the candidate join keys on the cell") {
    // feed keepSet a pre-assigned frame so the only joins in the plan
    // are pair mining + the anti-join (assignCells itself broadcasts
    // the tiny centroid set as an intentional nested-loop join)
    val assigned = frame(Seq.tabulate(40)(i =>
      (i.toLong + 10L, Seq(1.0 - i * 0.01, 0.1 + i * 0.02, 0.0))))
      .withColumn("cell", (col("id") % 2).cast("long"))
    val h = new graft.ops.CacheHandle
    val plan = SemanticDedup.keepSet(assigned, tau = 0.5, handle = h)
      .queryExecution.executedPlan.toString
    h.release()
    // no all-pairs comparison: the self-join must be an equi-join on
    // the cell id, never a nested-loop/cartesian product
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"semantic dedup pair mining is not cell-local:\n$plan")
  }
}
