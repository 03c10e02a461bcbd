package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches with DETERMINISTIC md5-derived hash
  * rows — unlike engine-native sketches (HLL/approx_quantile, which
  * the driver can only rows-check), a fixed hash family makes the
  * sketch bit-reproducible across engines, so its estimates are
  * oracle-checkable exactly (the q_sample_hash md5 discipline applied
  * to sketching).
  *
  * Scale stance: building is one exploded keyed aggregate — at most
  * `d × w` counter rows come out of the shuffle regardless of corpus
  * size (d, w are modeling constants), and partial aggregation
  * combines map-side, so the sketch is also the natural MERGE shape:
  * sketches of shards union + re-aggregate into the corpus sketch.
  * Downstream joins may broadcast the matrix — it is bounded by
  * construction, not corpus-derived (Corpus.scala's hint rule).
  */
object Sketches {

  /** Bucket of `c` in hash row `i` of width `w` (md5-portable). */
  private[graft] def cmBucket(c: Column, i: Int, w: Int): Column =
    conv(substring(md5(concat(lit(s"cm$i:"), c.cast("string"))), 1, 8),
      16, 10).cast("long") % w

  private def bucketRows(c: Column, d: Int, w: Int): Column =
    posexplode(array((0 until d).map(i => cmBucket(c, i, w)): _*))

  /** Build a count-min sketch over `keyCol`: the sparse (row, bucket,
    * cnt) counter matrix — absent counters are zero.
    */
  def countMin(df: DataFrame, keyCol: Column, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"need d > 0 and w > 0, got $d / $w")
    df.select(bucketRows(keyCol, d, w).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Approximate distinct count per group by LINEAR COUNTING: hash
    * every value into an `m`-bucket bitmap and estimate
    * `-m · ln(unset/m)` from the unset fraction. Same determinism
    * argument as [[countMin]]: the md5 bucket family makes the
    * estimate itself oracle-checkable, where engine-native HLL
    * (q_approx_distinct) can only be rows-checked. Cost: one
    * (group, bucket)-distinct aggregate — ≤ m rows per group out of
    * the shuffle regardless of group size; map-side partial
    * aggregation collapses duplicates early.
    *
    * Output: (groupCols..., n_buckets long, est_distinct double).
    * `est_distinct` is exact-formula IEEE math (ln of an integer
    * ratio), rounded to 6 for the cross-engine compare; callers
    * needing the saturated case (every bucket hit ⇒ ln 0) must raise
    * `m` — this guards it to `m` (the estimator's ceiling) instead of
    * infinity.
    */
  def linearCount(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      m: Int): DataFrame = {
    require(m > 0, s"m must be positive: $m")
    val gs = groupCols.map(col)
    df.select(gs :+ cmBucket(valueCol, 0, m).as("bucket"): _*)
      .distinct()
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("n_buckets"))
      .withColumn("est_distinct",
        when(col("n_buckets") < m,
          round(-lit(m.toDouble) *
            log((lit(m.toLong) - col("n_buckets")).cast("double") /
              lit(m.toDouble)), 6))
          .otherwise(lit(m.toDouble)))
  }

  /** Point-estimate frequencies for `items` (one per row of `itemCol`)
    * against a built sketch: min over the d rows of the item's
    * counters — the classic one-sided bound (never underestimates;
    * overestimates only by row-collision mass ≤ N/w per row w.h.p.).
    * Missing counters count as zero via the left join.
    */
  def cmEstimate(
      sketch: DataFrame,
      items: DataFrame,
      itemCol: Column,
      d: Int,
      w: Int): DataFrame =
    items
      .select(itemCol.as("item"))
      .select(col("item"), bucketRows(col("item"), d, w).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
}
