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
}
