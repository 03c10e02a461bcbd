package graft

import org.scalatest.funsuite.AnyFunSuite

/** The approximate-percentile scale path must stay close to the exact
  * form it replaces: q_quantiles (exact, oracle-checked, unbounded
  * per-group buffer) vs q_quantiles_approx (bounded sketch, rows-only
  * in the driver gate). This pins the tolerance so sketch accuracy
  * regressions fail CI.
  */
class QuantilesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx percentiles stay within 2% of the exact form per group") {
    val exact = SparkEntry.queries("q_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = SparkEntry.queries("q_quantiles_approx")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.keySet == approx.keySet)
    def close(a: Double, e: Double): Boolean =
      math.abs(a - e) <= math.max(0.02 * math.abs(e), 1e-9)
    exact.foreach { case (flag, (p50, p90, p99)) =>
      val (a50, a90, a99) = approx(flag)
      assert(close(a50, p50), s"$flag p50: approx=$a50 exact=$p50")
      assert(close(a90, p90), s"$flag p90: approx=$a90 exact=$p90")
      assert(close(a99, p99), s"$flag p99: approx=$a99 exact=$p99")
    }
  }
}
