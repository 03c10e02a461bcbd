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
}
