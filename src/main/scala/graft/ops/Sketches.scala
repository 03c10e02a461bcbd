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

  /** HyperLogLog distinct estimation with m = 64 registers — the
    * industry-standard cardinality sketch next to [[linearCount]]'s
    * simpler bitmap. Fully deterministic (md5-derived hash, integer
    * register/rank math via an explicit bit-length CASE chain — no
    * engine-specific clz), so like linearCount the ESTIMATE itself is
    * oracle-matchable: every double in the pipeline is either an
    * exact power of two (the 2^−M_j sum cannot round at any order),
    * an exact integer cast, or the final mirrored formula under
    * round(,6). Small-range correction (E ≤ 2.5m, V > 0 → linear
    * counting on empty registers) branches on values both engines
    * compute bit-identically. Shuffle cost: ≤ m rows per group leave
    * the partial aggregation however large the group.
    */
  def hllDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column): DataFrame = {
    val m = 64
    val gs = groupCols.map(col)
    val h = conv(substring(md5(concat(lit("hll:"), valueCol.cast("string"))),
      1, 8), 16, 10).cast("long")
    val base = df.select(gs :+ h.as("h"): _*)
      .withColumn("reg", expr("h % 64"))
      .withColumn("w", expr("h div 64"))
    // bit length of the 26-bit remainder via an explicit integer CASE
    // chain (highest bit first) — identical on any engine, unlike a
    // floor(log2(w)) whose boundary ulps could differ
    val bl = (0 to 25).foldLeft(when(lit(false), 0)) { (acc, i) =>
      acc.when(col("w") >= lit(1L << (25 - i)), 26 - i)
    }.otherwise(0)
    val regs = base
      .withColumn("rank", lit(27) - bl)
      .groupBy(gs :+ col("reg"): _*)
      .agg(max(col("rank")).as("mj"))
    regs.groupBy(gs: _*)
      .agg(count(lit(1)).as("present"),
        sum(pow(lit(2.0), (-col("mj")).cast("double"))).as("zp"))
      .withColumn("v", lit(m.toLong) - col("present"))
      .withColumn("z", col("v").cast("double") + col("zp"))
      .withColumn("e_raw", lit(0.709) * lit(4096.0) / col("z"))
      .withColumn("est_r",
        when(col("e_raw") <= lit(160.0) && col("v") > 0,
          round(lit(64.0) * log(lit(64.0) / col("v").cast("double")), 6))
          .otherwise(round(col("e_raw"), 6)))
      .drop("present", "zp", "z", "e_raw")
  }
}
