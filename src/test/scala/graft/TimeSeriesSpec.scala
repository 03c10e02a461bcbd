package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill synthesizes missing buckets and forward-fills") {
    import spark.implicits._
    val series = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 03:00:00"), 30.0),
      (2L, ts("2024-01-01 05:00:00"), 50.0)
    ).toDF("k", "h", "v")
    val out = TimeSeries.gapFill(series, "k", "h", Seq("v"),
      expr("interval 1 hour")).orderBy("k", "h").collect()
    assert(out.length == 5) // k=1: 00..03 (4 rows); k=2: single bucket
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getDouble(2)).toSeq == Seq(10.0, 10.0, 10.0, 30.0))
    assert(k1.map(_.getBoolean(3)).toSeq ==
      Seq(false, true, true, false))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && !k2(0).getBoolean(3) &&
      k2(0).getDouble(2) == 50.0)
  }

  test("gapFill leaves non-fill columns null on gap rows") {
    import spark.implicits._
    val series = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 02:00:00"), 2L, 20.0)
    ).toDF("k", "h", "n", "v")
    val out = TimeSeries.gapFill(series, "k", "h", Seq("v"),
      expr("interval 1 hour")).orderBy("h").collect()
    assert(out.length == 3)
    assert(out(1).isNullAt(2))          // n stays null on the gap row
    assert(out(1).getDouble(3) == 10.0) // v forward-filled
    assert(out(1).getBoolean(4))
  }

  test("gapFill rejects a __present collision") {
    import spark.implicits._
    val bad = Seq((1L, ts("2024-01-01 00:00:00"), true))
      .toDF("k", "h", "__present")
    intercept[IllegalArgumentException](
      TimeSeries.gapFill(bad, "k", "h", Nil, expr("interval 1 hour")))
  }

  test("madOutliers flags only beyond-k×MAD rows, robust to the outlier") {
    import spark.implicits._
    // group g: values 1..9 plus a wild 1000 → median 5.5, MAD ≈ 2.5;
    // a mean/stddev fence would be dragged by the 1000, MAD is not
    val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
      .toDF("k", "v")
    val got = TimeSeries.madOutliers(df, Seq("k"), "v", k = 3.0)
      .select("v").collect().map(_.getDouble(0)).sorted
    assert(got.toSeq == Seq(1000.0))
    // k large enough → nothing flagged
    assert(TimeSeries.madOutliers(df, Seq("k"), "v", k = 400.0).isEmpty)
  }

  test("ewmaTruncated: hand-computed chain, truncation, normalization") {
    import spark.implicits._
    val df = Seq(("u", 1L, 4.0), ("u", 2L, 8.0), ("u", 3L, 2.0))
      .toDF("k", "t", "v")
    val got = TimeSeries.ewmaTruncated(df, Seq("k"), "t", "v",
      alpha = 0.25, lags = 2)
      .orderBy("t").select("ewma_r").collect().map(_.getDouble(0))
    // w = (1, 0.75); t1: 4/1; t2: (8 + .75*4)/1.75; t3: (2 + .75*8)/1.75
    assert(got(0) == 4.0)
    assert(got(1) == math.rint((8.0 + 0.75 * 4.0) / 1.75 * 1e6) / 1e6)
    assert(got(2) == math.rint((2.0 + 0.75 * 8.0) / 1.75 * 1e6) / 1e6)
    // weights are exact dyadic powers, built by multiplication
    assert(TimeSeries.ewmaWeights(0.25, 4) == Seq(1.0, 0.75, 0.5625, 0.421875))
  }

  test("laggedCorr: lag-0 identity, hand formula, degenerate drop") {
    import spark.implicits._
    val xs = Seq(0L -> 1L, 1L -> 2L, 2L -> 4L, 3L -> 8L, 4L -> 3L)
      .toDF("hr", "v")
    val self = TimeSeries.laggedCorr(xs, xs, Seq(0, 1))
      .orderBy("lag_h").collect()
    assert(self.length == 2)
    // lag 0 pairs every bucket with itself → exactly 1.0
    assert(self(0).getLong(0) == 0L && self(0).getLong(1) == 5L &&
      self(0).getDouble(2) == 1.0)
    // lag 1: pairs (1,2),(2,4),(4,8),(8,3) — hand moments
    val (n, sx, sy, sxx, syy, sxy) = (4.0, 15.0, 17.0, 85.0, 93.0, 66.0)
    val r = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(self(1).getLong(1) == 4L &&
      self(1).getDouble(2) == math.rint(r * 1e6) / 1e6)
    // constant series → zero variance → the lag row is dropped
    val const = Seq(0L -> 7L, 1L -> 7L, 2L -> 7L).toDF("hr", "v")
    assert(TimeSeries.laggedCorr(xs, const, Seq(0)).isEmpty)
  }

  test("laggedCorr: ccf(x,y,l) equals ccf(y,x,-l); gaps drop pairs") {
    import spark.implicits._
    val xs = Seq(0L -> 3L, 1L -> 1L, 2L -> 5L, 4L -> 2L).toDF("hr", "v")
    val ys = Seq(0L -> 2L, 1L -> 6L, 2L -> 4L, 3L -> 9L).toDF("hr", "v")
    val fwd = TimeSeries.laggedCorr(xs, ys, Seq(1)).collect()
    val rev = TimeSeries.laggedCorr(ys, xs, Seq(-1)).collect()
    assert(fwd.length == 1 && rev.length == 1)
    assert(fwd(0).getLong(1) == rev(0).getLong(1) &&
      fwd(0).getDouble(2) == rev(0).getDouble(2))
    // x@4 has no y@5 partner and y@3's x@2 partner exists: 3 pairs
    assert(fwd(0).getLong(1) == 3L)
  }
}
