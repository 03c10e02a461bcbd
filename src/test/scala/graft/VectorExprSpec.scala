package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.VectorFunctions

class VectorExprSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.5f, -0.5f, 0.25f), Seq(-1.0f, 2.0f, 4.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)))
      .toDF("id", "a", "b")
      .select(col("id"),
        VectorFunctions.toDoubleArray(col("a")).as("a"),
        VectorFunctions.toDoubleArray(col("b")).as("b"))
  }

  test("native dot product matches the interpreted fold bit-for-bit") {
    val native = vecs.select(col("id"),
      VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
    val fold = vecs.select(col("id"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
    val n = native.orderBy("id").collect().map(_.getDouble(1))
    val f = fold.orderBy("id").collect().map(_.getDouble(1))
    assert(n.toSeq == f.toSeq)
    assert(n(0) == 32.0) // 4 + 10 + 18
    assert(n(2) == 0.0)
  }

  test("dot product runs inside whole-stage codegen") {
    // literal frames constant-fold to LocalTableScan; use a real scan
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VectorFunctions.toDoubleArray(col("embedding")).as("v"))
    val plan = e.select(VectorFunctions.dotProduct(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("dotproduct")),
      s"expected dotproduct inside a codegen span (*) in:\n$plan")
  }

  test("null arrays propagate null") {
    import spark.implicits._
    val df = Seq((1L, Option(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("id", "a", "b")
    val r = df.select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("d")).collect()
    assert(r.head.isNullAt(0))
  }

  test("l2Norm and cosineSimilarity compose") {
    // exclude the zero vector: ANSI mode (Spark 4 default) raises on
    // divide-by-zero, which a zero-norm row would trigger
    val withN = vecs.filter(col("id") =!= 3)
      .withColumn("na", VectorFunctions.l2Norm(col("a")))
      .withColumn("nb", VectorFunctions.l2Norm(col("b")))
      .withColumn("cos", VectorFunctions.cosineSimilarity(
        col("a"), col("b"), col("na"), col("nb")))
    val row = withN.filter(col("id") === 1).collect().head
    val cos = row.getAs[Double]("cos")
    assert(math.abs(cos - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("int8 quantization: codes bounded, round-trip error within " +
    "half a step, extremes saturate exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5, -0.25, 0.1, -0.5)), // symmetric extreme
      (2L, Seq(1e-8, 2e-8, -1e-8, 3e-8))) // tiny magnitudes
      .toDF("id", "v")
    val out = df
      .withColumn("scale", VectorFunctions.int8Scale(col("v")))
      .withColumn("q", VectorFunctions.int8Quantize(col("v"), col("scale")))
      .select("id", "v", "scale", "q")
      .as[(Long, Seq[Double], Double, Seq[Int])].collect()
    for ((_, v, scale, q) <- out) {
      assert(q.forall(c => c >= -127 && c <= 127))
      // reconstruction error of round-half-up codes is <= scale/2
      v.zip(q).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-12) }
      // the max-|x| element saturates to exactly +-127
      val iMax = v.indices.maxBy(i => math.abs(v(i)))
      assert(math.abs(q(iMax)) == 127)
    }
  }
}
