package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the declarative constraint audit a
  * pipeline runs before shipping a table (the dbt-test /
  * expectations-suite shape): each check is ONE aggregate returning a
  * single (check, n_violations) row, and [[report]] unions them into
  * the violation report with a pass flag.
  *
  * Scale stance: every check is a scan + aggregate (not-null/range are
  * map-side only; uniqueness is one keyed exchange; referential
  * integrity is one anti-join whose build side AQE sizes) — no check
  * ever materializes violating ROWS to the driver, only counts, so
  * the report costs the same shape at 100 TB as at gate scale.
  */
object Expectations {

  private def row(name: String, violations: Column): Column =
    violations.cast("long").as("n_violations")

  /** Rows where any of `cols` is null. */
  def notNull(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
    df.agg(row(name, sum(when(
      cols.map(col(_).isNull).reduce(_ || _), 1L).otherwise(0L))))
      .select(lit(name).as("check"), coalesce(col("n_violations"), lit(0L))
        .as("n_violations"))

  /** Non-null rows outside [lo, hi]. */
  def inRange(
      df: DataFrame, name: String, c: String,
      lo: Column, hi: Column): DataFrame =
    df.agg(row(name, sum(when(
      col(c).isNotNull && !col(c).between(lo, hi), 1L).otherwise(0L))))
      .select(lit(name).as("check"), coalesce(col("n_violations"), lit(0L))
        .as("n_violations"))

  /** Duplicate rows beyond the first per key: Σ (count − 1) over
    * over-represented key groups (null keys participate as a group —
    * duplicate nulls are duplicates).
    */
  def unique(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(row(name, sum(col("__c") - 1L)))
      .select(lit(name).as("check"), coalesce(col("n_violations"), lit(0L))
        .as("n_violations"))

  /** Child rows whose non-null key has no parent (SQL FK semantics:
    * null child keys are not violations).
    */
  def foreignKey(
      child: DataFrame, name: String, childCols: Seq[String],
      parent: DataFrame, parentCols: Seq[String]): DataFrame = {
    require(childCols.length == parentCols.length,
      s"key arity mismatch: $childCols vs $parentCols")
    val cond = childCols.zip(parentCols)
      .map { case (c, p) => child(c) === parent(p) }.reduce(_ && _)
    child.filter(childCols.map(col(_).isNotNull).reduce(_ && _))
      .join(parent, cond, "left_anti")
      .agg(row(name, count(lit(1))))
      .select(lit(name).as("check"), coalesce(col("n_violations"), lit(0L))
        .as("n_violations"))
  }

  /** Rows failing an arbitrary row-level predicate (nulls fail: an
    * expectation that cannot be evaluated is not satisfied).
    */
  def satisfies(df: DataFrame, name: String, pred: Column): DataFrame =
    df.agg(row(name, sum(when(coalesce(pred, lit(false)), 0L)
      .otherwise(1L))))
      .select(lit(name).as("check"), coalesce(col("n_violations"), lit(0L))
        .as("n_violations"))

  /** Union the checks into the report: (check, n_violations, pass),
    * one row per check, ordered by check name.
    */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check")
  }
}
