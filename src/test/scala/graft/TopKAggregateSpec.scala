package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{TopKByScore, VectorFunctions}

class TopKAggregateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("topK keeps best k with id tie-break, descending") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1.0, 10L), ("g1", 3.0, 11L), ("g1", 2.0, 12L),
      ("g1", 3.0, 9L), ("g1", 0.5, 13L),
      ("g2", 7.0, 20L))
      .toDF("g", "score", "id")
    val r = df.groupBy("g")
      .agg(TopKByScore.topK(col("score"), col("id"), 3).as("top"))
      .orderBy("g").collect()
    val g1 = r(0).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(g1 == Seq((3.0, 9L), (3.0, 11L), (2.0, 12L)))
    val g2 = r(1).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(g2 == Seq((7.0, 20L)))
  }

  test("matches the window-rank idiom on real embedding scores") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"),
        VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", VectorFunctions.l2Norm(col("v")))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = c.join(broadcast(q))
      .withColumn("cos_r", round(
        VectorFunctions.dotProduct(col("qv"), col("cv")) /
          (col("qn") * col("cn")), 6))

    val viaAgg = scored.groupBy("q_id")
      .agg(TopKByScore.topK(col("cos_r"), col("cand_id"), 3).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.score").as("cos_r"), col("col.id").as("cand_id"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_r").desc, col("cand_id"))
    val viaWindow = scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("cos_r"), col("cand_id"))

    val a = viaAgg.orderBy("q_id", "rank").collect().toSeq
    val b = viaWindow.orderBy("q_id", "rank").collect().toSeq
    assert(a == b)
  }

  test("map-side partial aggregation: plan contains partial TopKByScore") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 7, i.toDouble, i.toLong))
      .toDF("g", "score", "id")
    val p = df.groupBy("g")
      .agg(TopKByScore.topK(col("score"), col("id"), 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topkbyscore") || p.contains("ObjectHashAggregate"),
      s"expected partial object aggregation in:\n$p")
  }
}
