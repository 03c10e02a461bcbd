package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, QualityModel, Sketches}

class QualityModelSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def goodText =
    (1 to 30).map(i => s"tok$i").mkString(" ") // 30 tokens, no stopwords
  private def badText = "the a the a" // short, all stopwords

  test("featurize: rule label and feature values") {
    val df = Seq((1L, goodText), (2L, badText), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val f = QualityModel.featurize(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(f.length == 2) // null text dropped
    val good = f(0)
    assert(good.getAs[Double]("y") == 1.0)
    assert(good.getAs[Double]("x0") == 1.0)
    assert(good.getAs[Double]("x1") == 30.0 / 100.0)
    assert(good.getAs[Double]("x2") == 0.0)
    val bad = f(1)
    assert(bad.getAs[Double]("y") == 0.0) // 11 chars < 20, 4 tokens < 5
    assert(bad.getAs[Double]("x2") == 1.0) // all stopwords
  }

  test("trainLogReg: first-round gradient is the exact closed form") {
    // w = 0 → σ = 0.5 exactly; grad_j = Σ(0.5 − y)·x_j / n with
    // DECIMAL sums, so round 1 is bit-predictable
    val df = Seq((1L, goodText), (2L, badText)).toDF("doc_id", "text")
    val f = QualityModel.featurize(df, "doc_id", "text")
    val w1 = QualityModel.trainLogReg(f, iters = 1, lr = 1.0)
    // rows: good (y=1, x=(1, .3, 0, len/1000)); bad (y=0, x=(1, .04, 1, .011))
    val feats = f.orderBy("doc_id")
      .collect().map(r => (r.getDouble(1), // y
        Array(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    val n = feats.length.toDouble
    val expected = (0 to 3).map { j =>
      val g = feats.map { case (y, x) =>
        BigDecimal((0.5 - y) * x(j)).setScale(14, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      0.0 - 1.0 * (g.toDouble / n)
    }
    (0 to 3).foreach(j => assert(math.abs(w1(j) - expected(j)) < 1e-12,
      s"w$j: ${w1(j)} vs ${expected(j)}"))
    spark.catalog.clearCache()
  }

  test("trainLogReg separates a linearly separable rule; score agrees") {
    val docs = (1L to 40L).map { i =>
      if (i % 2 == 0) (i, goodText) else (i, badText)
    }.toDF("doc_id", "text")
    val f = QualityModel.featurize(docs, "doc_id", "text")
    val w = QualityModel.trainLogReg(f, iters = 20, lr = 1.0)
    val scored = QualityModel.scoreLogReg(f, w)
    // with only two distinct rows the trained model must rank the
    // good row strictly above the bad one and classify both correctly
    val byY = scored.select(col("y"), col("score_r"), col("pred"))
      .distinct().collect().map(r =>
        (r.getDouble(0), r.getDouble(1), r.getBoolean(2))).toSeq.sortBy(_._1)
    assert(byY.size == 2)
    assert(byY(1)._2 > byY(0)._2) // good scores higher
    assert(byY(1)._3 && !byY(0)._3)
    spark.catalog.clearCache()
  }

  test("dsirWeights: target-token docs weigh positive, raw-token negative") {
    val targetToks = Seq("alpha", "beta", "gamma")
    val rawToks = Seq("delta", "epsilon", "zeta")
    // buckets wide enough that the two token sets cannot collide —
    // verified below against the SAME hash the op uses, so the sign
    // assertion is airtight
    val m = 512
    val bdf = (targetToks ++ rawToks).toDF("tok")
      .select(col("tok"), Sketches.cmBucket(col("tok"), 0, m).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(targetToks.map(bdf).toSet.intersect(rawToks.map(bdf).toSet).isEmpty)
    val docs = (
      (1L to 10L).map(i => (i, true, targetToks.mkString(" "))) ++
      (11L to 20L).map(i => (i, false, rawToks.mkString(" ")))
    ).toDF("doc_id", "is_t", "text")
    val out = Corpus.dsirWeights(docs, "doc_id", "text",
      isTarget = col("is_t"), buckets = m)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    out.foreach { case (id, w, keep) =>
      if (id <= 10L) assert(w > 0 && keep, s"doc $id: $w")
      else assert(w < 0 && !keep, s"doc $id: $w")
    }
  }
}
