package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

class SketchesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def toks(dir: String = "/root/testdata/sf0.001") =
    Tables.table(spark, dir, "documents")
      .select(explode(graft.ops.TextDedup.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)

  test("count-min never underestimates; wide sketch is exact") {
    val t = toks().persist()
    try {
      val truth = t.groupBy("tok").agg(count(lit(1)).as("n_true"))
      // narrow sketch (the table's vocab is only ~31 tokens, so w must
      // be tiny to force collisions): est >= true ALWAYS, and with 31
      // keys in 2 buckets some estimate must be inflated
      val narrow = Sketches.countMin(t, col("tok"), d = 2, w = 2)
      val estN = Sketches.cmEstimate(narrow, truth, col("tok"), d = 2, w = 2)
        .join(truth, col("item") === col("tok"))
      assert(estN.filter(col("n_est") < col("n_true")).isEmpty,
        "count-min underestimated")
      assert(estN.filter(col("n_est") > col("n_true")).count() > 0,
        "w=2 over a 31-token vocab must collide")
      // wide sketch: few tokens per bucket row → exact for all keys
      val wide = Sketches.countMin(t, col("tok"), d = 4, w = 1 << 20)
      val estW = Sketches.cmEstimate(wide, truth, col("tok"), d = 4, w = 1 << 20)
        .join(truth, col("item") === col("tok"))
      assert(estW.filter(col("n_est") =!= col("n_true")).isEmpty,
        "wide sketch should be collision-free on this vocab")
    } finally { t.unpersist(); () }
  }

  test("sketch matrix is bounded by d x w and merges by union") {
    import spark.implicits._
    val a = Seq("x", "y", "x").toDF("k")
    val b = Seq("x", "z").toDF("k")
    val d = 3; val w = 8
    val skAll = Sketches.countMin(a.union(b), col("k"), d, w)
    assert(skAll.count() <= d.toLong * w)
    // shard sketches re-aggregate into exactly the corpus sketch
    val merged = Sketches.countMin(a, col("k"), d, w)
      .union(Sketches.countMin(b, col("k"), d, w))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val l = merged.collect().map(r =>
      (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val r0 = skAll.collect().map(r =>
      (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(l == r0)
    // unseen key with empty-bucket luck estimates 0 via the left join
    val est = Sketches.cmEstimate(skAll,
      Seq("nope").toDF("k"), col("k"), d, w).collect()
    assert(est.head.getLong(1) >= 0)
  }

  test("linear counting: formula check, duplicates ignored, saturation guarded") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 3L))
      .toDF("g", "v")
    val m = 64
    val out = Sketches.linearCount(df, Seq("g"), col("v"), m)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def est(hit: Long): Double =
      BigDecimal(-m.toDouble * math.log((m - hit).toDouble / m))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // duplicates of v=1 hit ONE bucket: group a has at most 2 buckets
    assert(out("a")._1 <= 2 && out("a")._2 == est(out("a")._1))
    assert(out("b")._1 == 1 && out("b")._2 == est(1))
    // m = 1 saturates every group: the guard returns m, not ln(0)
    val sat = Sketches.linearCount(df, Seq("g"), col("v"), m = 1)
      .collect().map(r => r.getDouble(2))
    assert(sat.forall(_ == 1.0))
  }
}
