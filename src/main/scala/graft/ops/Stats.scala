package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-comparison statistics for corpus/experiment analysis:
  * the nonparametric two-sample test (did the new crawl shift the
  * quality-score distribution?) and the Benford leading-digit screen
  * (fabricated/synthetic numeric columns rarely obey it).
  */
object Stats {

  /** Mann-Whitney U via distributed ranking — the nonparametric
    * two-sample location test (no normality assumption, robust to
    * outliers; the standard A/B gate for skewed metrics).
    *
    * Ranks come from [[ScaleOps.globalRowNumber]] — the two-phase
    * range-partition + prefix-offset shape — NOT a single-partition
    * global window, so ranking scales across executors. Ties get the
    * conventional average rank, derived as min(rn) + (cnt−1)/2 per
    * distinct value: that derivation is INDEPENDENT of how the
    * unique-key tiebreak (`idCol`) ordered tied rows, so the
    * statistic is deterministic even though row numbers inside a tie
    * group are not semantically meaningful. Average ranks are exact
    * multiples of 0.5 and their sums stay exact in doubles (every
    * intermediate is dyadic) — rank sums and U hash bit-equal
    * cross-engine with no accumulation-order concern.
    *
    * Output: one row per group — (g, n, rank_sum_r, u_r) with
    * U = R_g − n_g(n_g+1)/2. For the classic two-sample test read
    * either row (U₁ + U₂ = n₁·n₂).
    */
  def mannWhitneyU(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      idCol: String,
      partitions: Int = 32): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      col(valCol).cast("double").as("v"), col(idCol).as("__id"))
    val rn = ScaleOps.globalRowNumber(base, partitions, col("v"), col("__id"))
    val ranks = rn.groupBy("v")
      .agg(min(col("rn")).as("__minrn"), count(lit(1)).as("__cnt"))
      .withColumn("avg_rank", col("__minrn").cast("double") +
        (col("__cnt") - 1).cast("double") / 2.0)
      .select("v", "avg_rank")
    // value-keyed join back: NDV-sized side, no hint (AQE decides)
    rn.join(ranks, "v")
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("avg_rank")).as("__rsum"))
      .withColumn("rank_sum_r", round(col("__rsum"), 6))
      .withColumn("u_r", round(col("__rsum") -
        col("n").cast("double") * (col("n") + 1).cast("double") / 2.0, 6))
      .select("g", "n", "rank_sum_r", "u_r")
  }

  /** Leading significant digit of a positive numeric column, taken
    * from the INTEGER part's string form — `floor` then BIGINT then
    * VARCHAR is bit-identical on every engine, where a decimal-cast
    * route would expose half-up vs half-even rounding at the 10^k
    * boundaries (the floor-not-round rule). Caller guarantees
    * `c >= 1` (true for prices/amounts; filter upstream otherwise).
    */
  def leadingDigit(c: Column): Column =
    substring(floor(c).cast("bigint").cast("string"), 1, 1).cast("int")

  /** Benford leading-digit screen: observed digit shares vs the
    * Benford expectation p_d = ln(1 + 1/d)/ln(10), with the χ²
    * contribution per digit. One digit-keyed aggregate + a 1-row
    * broadcast total; digits with zero observations still appear
    * (right-join against the 1..9 spine) so the χ² sum is complete.
    */
  def benfordDigits(
      df: DataFrame,
      valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df.filter(col(valCol).isNotNull && col(valCol) >= 1)
      .select(leadingDigit(col(valCol)).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = (1 to 9).toDF("digit")
    val tot = obs.agg(sum(col("n")).cast("long").as("n_tot"))
    spine.join(obs, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("p_exp",
        log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)))
      .withColumn("p_obs_r",
        round(col("n").cast("double") / col("n_tot").cast("double"), 6))
      .withColumn("p_exp_r", round(col("p_exp"), 6))
      .withColumn("chi_r", round(
        (col("n").cast("double") - col("p_exp") * col("n_tot").cast("double")) *
          (col("n").cast("double") - col("p_exp") * col("n_tot").cast("double")) /
          (col("p_exp") * col("n_tot").cast("double")), 6))
      .select("digit", "n", "p_obs_r", "p_exp_r", "chi_r")
  }
}
