package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-shaping utilities for the 100 TB regime. AQE's skew-join
  * splitting (on in [[graft.GraftSession]]) handles *detected* skew at
  * runtime; these are the explicit tools for when the skew is known
  * up front (a hot key in a fact↔fact join) or when a join should be
  * co-located by layout instead of shuffled at all.
  */
object ScaleOps {

  /** Salted equi-join for skewed keys.
    *
    * The big (skewed) side gets a deterministic salt derived from
    * `saltSource` (any column(s) roughly unique per row — an id,
    * `input_file_block_start`, …); the small side is replicated
    * `nSalts` ways. The join key becomes (key, salt), spreading each
    * hot key over `nSalts` reducers. Deterministic — no `rand()` — so
    * results are reproducible and retries are safe.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: Column,
      nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(nSalts.toLong)).cast("int"))
    val saltValues = array((0 until nSalts).map(lit): _*)
    val smallS = small.withColumn("__salt", explode(saltValues))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write a table bucketed (and sorted) by its join key. Two tables
    * bucketed the same way join with zero exchange — the physical
    * answer to "this join shuffles 100 TB every night".
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Repartition-by-key helper: pre-shape a dataset so several
    * downstream keyed operations (join + groupBy on the same key)
    * reuse one exchange.
    */
  def shapeByKey(df: DataFrame, partitions: Int, key: String*): DataFrame =
    df.repartition(partitions, key.map(col): _*)
}
