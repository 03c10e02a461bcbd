package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series shaping: the "resample + forward-fill"
  * primitive every monitoring/feature pipeline needs (metric series
  * with silent hours, sensor feeds, training-label grids).
  */
object TimeSeries {

  /** Fill a per-key time series onto a regular grid and forward-fill
    * selected columns across the introduced gaps.
    *
    * Input is one row per PRESENT bucket (pre-aggregate upstream);
    * output is one row per grid bucket from each key's min to max
    * timestamp inclusive (Spark `sequence`, matching DuckDB
    * `generate_series`), with `is_gap` marking synthesized rows and
    * each `fillCols` column carrying the last non-null value at or
    * before the bucket (other columns stay null on gap rows).
    *
    * Scale shape: the grid explodes from a 2-column per-key bounds
    * aggregate — |keys| rows in flight, never the raw series; the
    * left join and the forward-fill window both key on (key, ts) /
    * (key), one exchange each on the same key. The forward-fill frame
    * is ROWS UNBOUNDED PRECEDING..CURRENT — `last(ignoreNulls)` over
    * a running frame, Spark evaluates it incrementally, not O(n²).
    * Grid size per key is (span / step) + 1 — callers own bounding
    * the span (a single stray year-old bucket inflates the grid;
    * cap or split the span upstream for unbounded-age feeds).
    */
  def gapFill(
      series: DataFrame,
      keyCol: String,
      tsCol: String,
      fillCols: Seq[String],
      step: Column): DataFrame = {
    require(!series.columns.contains("__present"),
      "input already has a '__present' column")
    val marked = series.withColumn("__present", lit(true))
    val bounds = series.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"), step)).as(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = grid.join(marked, Seq(keyCol, tsCol), "left")
    val filled = fillCols.foldLeft(joined)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.withColumn("is_gap", col("__present").isNull).drop("__present")
  }

  /** Robust outlier detection via median absolute deviation — the
    * monitoring-grade alternative to z-scores (one wild point moves a
    * mean/stddev fence; the median fences don't budge until half the
    * group is bad). Returns the rows whose absolute deviation from
    * their group median exceeds `k` × MAD, with the rounded deviation
    * and fence attached.
    *
    * Cross-engine contract: `percentile(…, 0.5)` is Spark's EXACT
    * interpolating median — the same linear-interpolation definition
    * as DuckDB's `quantile_cont` (the q_quantiles precedent) — and
    * the flag compares ROUNDED deviation against ROUNDED fence (the
    * round-before-threshold rule), so boundary rows can't flap
    * between engines.
    *
    * Scale shape: two keyed exact-median aggregates (each one
    * exchange of the group's values) + a fence join back. The fence
    * side is |groups| rows — broadcast-safe only when the key domain
    * is app-bounded; no hint here, AQE decides (the corpus-aggregate
    * rule). Exact percentile holds a group's values on one reducer —
    * at true 100-TB group sizes swap in approx_percentile and widen
    * the fence, trading the oracle for scale.
    */
  def madOutliers(
      df: DataFrame,
      keyCols: Seq[String],
      valCol: String,
      k: Double = 3.0): DataFrame = {
    require(keyCols.nonEmpty, "madOutliers needs at least one key column")
    val kc = keyCols.map(col)
    val med = df.groupBy(kc: _*)
      .agg(percentile(col(valCol), lit(0.5)).as("__med"))
    val dev = df.join(med, keyCols)
      .withColumn("__adev", abs(col(valCol) - col("__med")))
    val mad = dev.groupBy(kc: _*)
      .agg(percentile(col("__adev"), lit(0.5)).as("__mad"))
    dev.join(mad, keyCols)
      .withColumn("dev_r", round(col("__adev"), 6))
      .withColumn("fence_r", round(lit(k) * col("__mad"), 6))
      .filter(col("dev_r") > col("fence_r"))
      .drop("__med", "__adev", "__mad")
  }

  /** Weights (1−α)^i for i < lags, built by repeated multiplication —
    * NOT `math.pow`, whose rounding is platform-discretionary (the
    * sqrt-not-pow rule); a product chain is plain IEEE multiplies the
    * oracle reproduces exactly from the same literals.
    */
  def ewmaWeights(alpha: Double, lags: Int): Seq[Double] = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(lags >= 1, s"lags must be >= 1, got $lags")
    Seq.iterate(1.0, lags)(_ * (1.0 - alpha))
  }

  /** Truncated exponentially-weighted moving average over the last
    * `lags` OBSERVED points of each key's series — the smoothing /
    * anomaly-baseline primitive of metric pipelines.
    *
    * ewma_t = Σ_{i<lags} w_i·x_{t−i} / Σ_{i<lags, present} w_i with
    * w_i = (1−α)^i — the truncated form rather than the infinite
    * recursion, for two reasons: the recursive form is inexpressible
    * without per-row state (and its closed form needs pow(1−α, −s),
    * which overflows), and truncation makes the sum a FIXED
    * `lags`-term arithmetic expression. The expression tree is the
    * same left-associated chain on both engines, every product and
    * add identically ordered IEEE ops on identical literals — the
    * result is bit-equal cross-engine with no rounding slack needed
    * (still rounded to 6 for the gate hash, the float-output rule).
    *
    * Scale shape: one window exchange on the key, `lags` lag() reads
    * per row inside it, no self-join, no state growth with series
    * length.
    */
  def ewmaTruncated(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valCol: String,
      alpha: Double = 0.25,
      lags: Int = 12): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val ws = ewmaWeights(alpha, lags)
    val v = col(valCol).cast("double")
    // i = 0 is the current row itself — written as plain `v` on both
    // engines rather than lag(v, 0), sidestepping offset-0 lag quirks
    val num = ws.zipWithIndex
      .map {
        case (wt, 0) => lit(wt) * v
        case (wt, i) => lit(wt) * coalesce(lag(v, i).over(w), lit(0.0))
      }
      .reduce(_ + _)
    val den = ws.zipWithIndex
      .map {
        case (wt, 0) => lit(wt)
        case (wt, i) =>
          lit(wt) *
            when(lag(v, i).over(w).isNotNull, lit(1.0)).otherwise(lit(0.0))
      }
      .reduce(_ + _)
    // den ≥ w_0 = 1 always (the current row is present) — no zero guard
    df.withColumn("ewma_r", round(num / den, 6))
  }

  /** Forecast weights of truncated Holt linear (double-exponential)
    * smoothing: with zero-initialized level/trend state, l_t and b_t
    * are LINEAR in the last `lags` observations, so the one-step
    * forecast l+b collapses to a fixed weight per observation —
    * computed once here and embedded as the SAME literals on both
    * engines (the ewmaWeights pattern, extended to the two-state
    * recursion). Index i = lags−1 is the current row.
    */
  def holtWeights(alpha: Double, beta: Double, lags: Int): Seq[Double] = {
    require(lags >= 2, s"holt needs at least 2 lags, got $lags")
    var lC = Array.fill(lags)(0.0)
    var bC = Array.fill(lags)(0.0)
    for (t <- 0 until lags) {
      val nl = new Array[Double](lags)
      val nb = new Array[Double](lags)
      for (i <- 0 until lags) {
        val prev = lC(i) + bC(i)
        nl(i) = (1 - alpha) * prev + (if (i == t) alpha else 0.0)
        nb(i) = beta * (nl(i) - lC(i)) + (1 - beta) * bC(i)
      }
      lC = nl; bC = nb
    }
    (0 until lags).map(i => lC(i) + bC(i))
  }

  /** Truncated Holt linear smoothing per key: the one-step forecast
    * level+trend as a FIXED `lags`-term weighted lag chain
    * ([[holtWeights]]), left-associated identically on both engines —
    * bit-equal before the gate round, like [[ewmaTruncated]]. Unlike
    * EWMA there is no denominator renormalization for short
    * histories: a truncated Holt over fewer observations is a
    * different estimator, so rows without a FULL `lags`-deep history
    * emit null (callers filter) — the contract stays crisp.
    * Scale shape: one window exchange on the key, `lags` lag() reads
    * per row, no state growth with series length.
    */
  def holtTruncated(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valCol: String,
      alpha: Double = 0.25,
      beta: Double = 0.5,
      lags: Int = 8): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val ws = holtWeights(alpha, beta, lags)
    val v = col(valCol).cast("double")
    val f = ws.zipWithIndex.map { case (wt, i) =>
      val d = lags - 1 - i
      if (d == 0) lit(wt) * v else lit(wt) * lag(v, d).over(w)
    }.reduce(_ + _)
    df.withColumn("holt_r", round(f, 6))
  }

  /** Pearson correlation between two bucketed series at each of a
    * fixed list of integer lags — the ACF/CCF primitive behind
    * seasonality detection ("is there a 24-bucket cycle?") and
    * lead/lag discovery ("do clicks lead purchases by 2 hours?").
    *
    * Inputs are PRE-AGGREGATED (bucket `hr` Long, value `v`) frames —
    * callers collapse the raw corpus to its calendar-bounded bucket
    * grid first, so everything here runs over |buckets| × |lags|
    * rows however big the corpus is. A pair exists only where BOTH
    * buckets are present (missing buckets drop the pair rather than
    * faking a zero); correlation at lag L pairs x(t) with y(t+L).
    *
    * Cross-engine exactness (the q_corr_exact treatment): values are
    * cast to DECIMAL(18,0) and the five moments summed exactly
    * (order-independent), the variance/covariance doubles are formed
    * from those integers in one fixed association, `sqrt` (IEEE
    * correctly-rounded, never pow) and one division at the end,
    * rounded to 6 for the gate. Degenerate lags (zero variance on
    * either side) are dropped on both engines.
    *
    * Scale shape: the lag fan-out is an explode of a literal array
    * (|lags| is a query constant); the pairing is one equi-join
    * shuffling the bounded bucket frames on the shifted key; the
    * moment aggregate is map-side-combined down to 6 numbers per lag.
    */
  def laggedCorr(xs: DataFrame, ys: DataFrame, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty, "laggedCorr needs at least one lag")
    val d = (c: Column) => c.cast("double")
    val x = xs.select(col("hr").as("xhr"),
        col("v").cast("decimal(18,0)").as("x"))
      .select(col("xhr"), col("x"),
        explode(array(lags.map(l => lit(l.toLong)): _*)).as("lag_h"))
    val y = ys.select(col("hr").as("yhr"),
      col("v").cast("decimal(18,0)").as("y"))
    x.join(y, col("yhr") === col("xhr") + col("lag_h"))
      .groupBy("lag_h")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("varx",
        col("n_pairs") * d(col("sxx")) - d(col("sx")) * d(col("sx")))
      .withColumn("vary",
        col("n_pairs") * d(col("syy")) - d(col("sy")) * d(col("sy")))
      .filter(col("varx") > 0 && col("vary") > 0)
      .select(col("lag_h"), col("n_pairs"),
        round((col("n_pairs") * d(col("sxy")) -
          d(col("sx")) * d(col("sy"))) /
          (sqrt(col("varx")) * sqrt(col("vary"))), 6).as("corr_r"))
  }

  /** Coalesce overlapping/touching intervals per key into maximal
    * spans (gaps-and-islands): availability windows, session spans,
    * maintenance blackouts. An interval starts a new island exactly
    * when its start exceeds the running max end of everything before
    * it in (start, end) order; islands then aggregate to
    * (span_start, span_end, n_merged).
    *
    * Deterministic under ties: equal (start, end) rows produce the
    * same island flags in any order (the second of a duplicate pair
    * always sees prevMax ≥ its own end). One exchange on the key for
    * the window, reused by the island aggregate — per-key series
    * sort, the same scale contract as every keyed window here.
    */
  def mergeIntervals(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    val kc = keyCols.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new",
        when(prevMax.isNull || (col(startCol) > prevMax), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("__island", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(kc :+ col("__island"): _*)
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** Linear interpolation across the null gaps of a (typically
    * [[gapFill]]-produced) regular or irregular series — the
    * between-points fill LOCF can't give (sensor readings, hourly
    * rates). For a null at t between the nearest non-null neighbors
    * (t_p, v_p) and (t_n, v_n):
    * v = v_p + (v_n − v_p) · (t − t_p)/(t_n − t_p), written in
    * EXACTLY that association on both engines over exact integer
    * epoch seconds — bit-equal cross-engine before the gate round.
    * Leading/trailing nulls (no neighbor on one side) stay null.
    * Two windows on the same key exchange, no joins.
    */
  def interpolateLinear(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valCol: String): DataFrame = {
    val kc = keyCols.map(col)
    val t = unix_timestamp(col(tsCol)).cast("double")
    val v = col(valCol).cast("double")
    val wp = Window.partitionBy(kc: _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(kc: _*).orderBy(col(tsCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(v, ignoreNulls = true).over(wp)
    val pt = last(when(v.isNotNull, t), ignoreNulls = true).over(wp)
    val nv = first(v, ignoreNulls = true).over(wn)
    val nt = first(when(v.isNotNull, t), ignoreNulls = true).over(wn)
    df.withColumn("interp_r",
      round(
        when(v.isNotNull, v)
          .otherwise(pv + (nv - pv) * ((t - pt) / (nt - pt))), 6))
  }
}
