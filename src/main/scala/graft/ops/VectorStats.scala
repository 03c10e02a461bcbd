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
  * standardization carry an explicit broadcast hint, valid HERE
  * because the row count is bounded by the embedding DIMENSION — a
  * modeling constant, not the corpus (see CLAUDE.md: broadcast-hint
  * rule).
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

  /** Top principal component of the embedding corpus by distributed
    * power iteration — the "what single direction explains this
    * embedding space" diagnostic (drift axes, dominant cluster
    * separation, whitening pre-step).
    *
    * Shape: the dim-moment sums S_i and the second-moment matrix
    * SS_ij reduce the corpus to d and d² rows (the pair fan-out is
    * bounded by dim², never by rows²); the covariance
    * C_ij = (SS_ij − S_i·S_j/n)/n is O(1)-magnitude at ANY corpus
    * size (the /n keeps later decimal casts in range), and each of
    * the fixed `rounds` matvecs is a d²-row join against a d-row
    * broadcast vector. The driver never holds the matrix.
    *
    * Cross-engine exactness: every sum that runs over unbounded or
    * matrix-sized row sets (element sums, pair products, matvec
    * terms, norm squares) is DECIMAL(28,14)-cast per term before SUM
    * (order-independent — the logreg gradient treatment); divisions
    * and the sqrt happen once per value in a fixed association, so
    * the whole iteration is bit-reproducible and the oracle unrolls
    * the identical rounds. Output: one row per dimension
    * (i, v_r, lambda_r) — the unit eigenvector and the eigenvalue
    * estimate (the last round's pre-normalization norm).
    */
  def pcaPowerTop(
      df: DataFrame,
      idCol: String,
      embeddingCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val dec = (c: Column) => c.cast("decimal(28,14)")
    val d = (c: Column) => c.cast("double")
    // repartition BEFORE the explode: a single-file source otherwise
    // funnels the whole element frame (and every aggregate above it)
    // through one task
    val e = QueryCaches.persist(
      df.repartition(ScaleOps.fanoutWidth(df)).select(col(idCol).as("__id"),
          posexplode(VectorFunctions.toDoubleArray(col(embeddingCol)))
            .as(Seq("i", "x")))
        .withColumn("i", col("i").cast("long")))
    e.count() // eager: the sI/sJ broadcast futures race a lazy cache
    val sf = e.groupBy("i")
      .agg(count(lit(1)).as("n"), d(sum(dec(col("x")))).as("s"))
    // the second-moment matrix is symmetric: aggregate only i ≤ j
    // (half the d² pair rows and decimal casts) and mirror after —
    // x_i·x_j and x_j·x_i are the same doubles, so the mirrored
    // cell is the identical exact sum the full fan-out produced
    val ssUp = QueryCaches.persist( // both union branches read it
      e.as("a").join(e.as("b"),
        col("a.__id") === col("b.__id") && col("a.i") <= col("b.i"))
        .select(col("a.i").as("i"), col("b.i").as("j"),
          (col("a.x") * col("b.x")).as("p"))
        .groupBy("i", "j").agg(d(sum(dec(col("p")))).as("ss")))
    ssUp.count() // eager: both mirror branches must read the cache
    val ss = ssUp.unionByName(ssUp.filter(col("i") < col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("ss")))
    // dim-bounded sides: broadcast is valid by construction
    val sI = sf.select(col("i"), col("n"), col("s").as("si"))
    val sJ = sf.select(col("i").as("j"), col("s").as("sj"))
    val cmat = QueryCaches.persist(
      ss.join(broadcast(sI), "i").join(broadcast(sJ), "j")
        .select(col("i"), col("j"),
          ((col("ss") - col("si") * col("sj") / col("n")) / col("n"))
            .as("c")))
    // EAGER materialization: every round issues broadcast exchanges
    // (the matvec vector, the norm scalar) whose subtrees sit above
    // cmat, and Spark runs broadcast futures as separate concurrent
    // jobs — against a still-lazy cache they each re-ran the d²-pair
    // aggregate (PerfProbe showed the same 64-task stage 8×; this
    // one cheap count cut the query 16.3 → ~6 s at sf0.1)
    cmat.count()
    var cur: Option[DataFrame] = None
    var out: DataFrame = null
    for (_ <- 1 to rounds) {
      val w = cur match {
        case None =>
          cmat.groupBy("i")
            .agg(d(sum(dec(col("c") * lit(0.125)))).as("w"))
        case Some(vf) =>
          cmat.join(broadcast(vf.select(col("i").as("j"), col("v"))), "j")
            .groupBy("i").agg(d(sum(dec(col("c") * col("v")))).as("w"))
      }
      val n2 = w.agg(d(sum(dec(col("w") * col("w")))).as("n2"))
      // lazy plan cut per round (the TextDedup.clusters rule): the
      // next round's broadcast(vf) future otherwise re-expands every
      // earlier round's matvec subtree
      out = w.crossJoin(broadcast(n2))
        .select(col("i"), (col("w") / sqrt(col("n2"))).as("v"), col("n2"))
        .localCheckpoint(false)
      cur = Some(out)
    }
    // v_r + 0.0: an eigenvector component can land AT zero (a
    // dimension orthogonal to the top component) — the computed-zero
    // rule; lambda_r is a sqrt, always +0-signed, no guard needed
    out.select(col("i"), (round(col("v"), 6) + lit(0.0)).as("v_r"),
      round(sqrt(col("n2")), 6).as("lambda_r"))
  }

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
