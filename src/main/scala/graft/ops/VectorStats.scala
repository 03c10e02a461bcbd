package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.VectorFunctions

/** Corpus-level embedding statistics and normalization — the
  * pre-processing half of the vector pipeline (standardize before
  * indexing/clustering so no dimension dominates the metric).
  *
  * Scale stance: per-dimension stats are ONE exploded keyed aggregate
  * (posexplode → per-pos moments, map-side combined) — |dim| output
  * rows regardless of corpus size. The stats joined back for
  * standardization carry an explicit broadcast hint, which is valid
  * HERE because the row count is bounded by the embedding DIMENSION
  * (a modeling constant, like a dimension table) — not by the corpus
  * (Corpus.scala's rule forbids hints only on aggregates whose size
  * grows with the data).
  */
object VectorStats {

  /** Per-dimension moments over the corpus: (pos long, n long, mu,
    * sd) with sd the population deviation `sqrt(max(0, E[x²]−µ²))`
    * (clamped so float noise near zero variance cannot produce a NaN
    * under ANSI sqrt).
    */
  def dimStats(df: DataFrame, embeddingCol: String): DataFrame =
    df.select(posexplode(VectorFunctions.toDoubleArray(col(embeddingCol)))
        .as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), avg(col("x")).as("mu"),
        avg(col("x") * col("x")).as("ex2"))
      .select(col("pos").cast("long").as("pos"), col("n"), col("mu"),
        sqrt(greatest(col("ex2") - col("mu") * col("mu"), lit(0.0)))
          .as("sd"))

  /** Z-score every element against [[dimStats]]: output
    * (idCol, pos long, x, z) with zero-variance dimensions dropped
    * (z is undefined there, and the engines disagree on x/0). The
    * stats side is dim-bounded — broadcast by design.
    */
  def standardize(
      df: DataFrame,
      idCol: String,
      embeddingCol: String): DataFrame = {
    val stats = dimStats(df, embeddingCol).filter(col("sd") > 0)
    df.select(col(idCol),
        posexplode(VectorFunctions.toDoubleArray(col(embeddingCol)))
          .as(Seq("pos", "x")))
      .withColumn("pos", col("pos").cast("long"))
      .join(broadcast(stats), Seq("pos"))
      .select(col(idCol), col("pos"), col("x"),
        ((col("x") - col("mu")) / col("sd")).as("z"))
  }
}
