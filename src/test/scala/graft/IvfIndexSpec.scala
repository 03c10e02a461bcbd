package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.VectorFunctions
import graft.ops.IvfIndex

class IvfIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("groupCentroids: keyed element-wise mean matches hand computation") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f, 3.0f)),
      (0, Array(3.0f, 4.0f, 5.0f)),
      (1, Array(10.0f, 0.0f, -2.0f)))
      .toDF("label", "embedding")
    val out = IvfIndex.groupCentroids(df, "label", "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      (0, 0L) -> (2.0, 2L), (0, 1L) -> (3.0, 2L), (0, 2L) -> (4.0, 2L),
      (1, 0L) -> (10.0, 1L), (1, 1L) -> (0.0, 1L), (1, 2L) -> (-2.0, 1L)))
  }

  test("k-means IVF: deterministic build, high recall@1 vs brute force") {
    val emb = Tables.table(spark, dir, "embeddings")
    val model = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
    assert(model.centroids.length == 8)
    // every vector lands in exactly one cell
    assert(model.assigned.count() == emb.count())
    assert(model.assigned.select("cell").distinct().count() <= 8)

    val queries = emb.filter(col("vec_id") < 20)
    val got = IvfIndex.search(model, queries, "vec_id", "embedding",
      topK = 1, nprobe = 4)
      .select(col("q_id"), element_at(col("neighbors"), 1).getField("id")
        .as("nn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute-force truth
    val e = emb.select(col("vec_id"),
      VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", VectorFunctions.l2Norm(col("v")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("cand_id"), col("v").as("cv"),
      col("nrm").as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("s").desc, col("cand_id"))
    val truth = c.join(broadcast(q)).filter(col("q_id") =!= col("cand_id"))
      .withColumn("s", VectorFunctions.dotProduct(col("qv"), col("cv")) /
        (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("q_id", "cand_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val hits = truth.count { case (qid, nn) => got.get(qid).contains(nn) }
    val recall = hits.toDouble / truth.size
    // random 64-d embeddings + nprobe=4/8 cells: most true NNs found
    assert(recall >= 0.5, s"recall@1 = $recall (hits=$hits of ${truth.size})")
    // and the search result must be a subset of probed cells only
    assert(got.size == truth.size)
  }

  test("buildExact: deterministic Lloyd trainer covers the corpus and repeats bit-exactly") {
    val emb = Tables.table(spark, dir, "embeddings")
    val m1 = IvfIndex.buildExact(emb, "vec_id", "embedding", k = 4, iters = 2)
    // cells may go empty during Lloyd, never exceed k
    assert(m1.centroids.nonEmpty && m1.centroids.length <= 4)
    assert(m1.assigned.count() == emb.count())
    // exact arithmetic -> the trained coordinates are REPRODUCIBLE
    // bit for bit, the property the DuckDB oracle relies on
    val m2 = IvfIndex.buildExact(emb, "vec_id", "embedding", k = 4, iters = 2)
    assert(m1.centroids.map { case (i, c) => (i, c.toSeq) }.toSeq ==
      m2.centroids.map { case (i, c) => (i, c.toSeq) }.toSeq)
    spark.catalog.clearCache()
    graft.ops.QueryCaches.releaseAll()
  }

  test("saved index round-trips and search prunes to the probed cells") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString
    try {
      val emb = Tables.table(spark, dir, "embeddings")
      val model = IvfIndex.build(emb, "vec_id", "embedding", k = 8)
      IvfIndex.save(model, base)
      val loaded = IvfIndex.load(spark, base)
      assert(loaded.centroids.map(_._1).toSeq ==
        model.centroids.map(_._1).toSeq)
      assert(loaded.assigned.count() == model.assigned.count())

      val queries = emb.filter(col("vec_id") < 20)
      def results(m: IvfIndex.Model) =
        IvfIndex.search(m, queries, "vec_id", "embedding",
          topK = 3, nprobe = 2)
          .select(col("q_id"), expr("transform(neighbors, n -> n.id)")
            .as("ids"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      // cold (loaded) index returns exactly the in-memory results
      assert(results(loaded) == results(model))

      // the cell-partitioned layout must actually prune: the scan over
      // the saved assignment carries partition filters on `cell`
      // (dynamic pruning from the probed-cells join side)
      val sr = IvfIndex.search(loaded, queries, "vec_id", "embedding",
        topK = 3, nprobe = 2)
      sr.collect()
      val plan = sr.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") ||
        plan.contains("PartitionFilters: [isnotnull(cell"),
        s"no partition pruning on the saved assignment scan:\n$plan")
      model.assigned.unpersist()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(base)).deleteRecursively()
    }
  }

  test("append maintains a saved index identically to batch assignment") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_ivf_incr").toString
    try {
      val emb = Tables.table(spark, dir, "embeddings")
      // wave 1 builds and saves; wave 2 arrives later and is appended
      // with the SAVED centroids — no rebuild
      val w1 = emb.filter(col("vec_id") < 250)
      val w2 = emb.filter(col("vec_id") >= 250)
      val model = IvfIndex.build(w1, "vec_id", "embedding", k = 4)
      IvfIndex.save(model, base)
      IvfIndex.append(spark, base, w2, "vec_id", "embedding")
      val updated = IvfIndex.load(spark, base)

      // cell assignment must equal batch assignment of the full corpus
      // under the same centroids (arrival wave cannot matter)
      val incr = updated.assigned.select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = IvfIndex.assign(model, emb, "vec_id", "embedding")
        .select("vec_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(incr == batch)

      // and search over the appended index == search over the
      // batch-assigned index (same centroids, same candidates)
      val queries = emb.filter(col("vec_id") < 10)
      def results(m: IvfIndex.Model) =
        IvfIndex.search(m, queries, "vec_id", "embedding",
          topK = 3, nprobe = 2)
          .select(col("q_id"), expr("transform(neighbors, n -> n.id)")
            .as("ids"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      val batchModel = IvfIndex.Model(model.centroids,
        IvfIndex.assign(model, emb, "vec_id", "embedding"))
      assert(results(updated) == results(batchModel))
      model.assigned.unpersist()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(base)).deleteRecursively()
    }
  }
}
