package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity self-joins on short strings — the entity-resolution
  * primitive (customer/vendor name matching, near-duplicate titles).
  */
object FuzzyJoin {

  /** Cap blocking-key groups before a blocked self-join: rows whose
    * block exceeds `maxBlockSize` members are DROPPED (with
    * [[TextDedup.capBuckets]]'s audit twin available on the same
    * inputs). The hazard is not just skew: a FIXED block-key domain
    * (brand × size, zip, first-letter) makes the MEAN block grow
    * linearly with the corpus, so the within-block pair join is
    * quadratic everywhere, not only on hot keys. Production linkage
    * either refines the blocking key until blocks are bounded or caps
    * here; `Int.MaxValue` (the oracle gates' setting) skips the cap
    * and is exact.
    */
  def capBlocks(
      df: DataFrame,
      keyCols: Seq[String],
      maxBlockSize: Int): DataFrame =
    if (maxBlockSize == Int.MaxValue) df
    else TextDedup.capBuckets(df, keyCols, maxBlockSize)

  /** Edit-distance self-join via the q-gram count filter: pairs
    * sharing too few q-grams cannot be within `maxDist` edits (each
    * edit destroys at most q grams — Gravano's bound, valid on
    * DISTINCT gram sets), so candidates come from a gram-posting join
    * plus the count filter, and the exact `levenshtein` predicate
    * keeps only true matches. Same build-prune-verify shape as
    * [[ScaleOps.bloomPrunedSemiJoin]]: the filters only PRUNE, the
    * final exact check owns correctness.
    *
    * Scale shape: the posting join costs Σ_g C(posting_g, 2) — hot
    * grams (shared prefixes like "Customer#") are the hazard, capped
    * via `maxPosting` exactly like LSH buckets ([[TextDedup
    * .capBuckets]]); under a cap, recall on pairs whose ONLY shared
    * grams are hot is traded away (the gate runs uncapped to mirror
    * the oracle). Strings shorter than q yield no grams and never
    * pair — callers pad or length-bucket those separately.
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 1,
      q: Int = 2,
      maxPosting: Int = 500,
      handle: CacheHandle = null): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val names = df.select(col(idCol).as("id"), col(strCol).as("name"))
    val grams = CacheHandle.persistWith(handle, names
      .filter(length(col("name")) >= q)
      .withColumn("gram", explode(expr(
        s"transform(sequence(1, length(name) - ${q - 1}), " +
          s"i -> substring(name, i, $q))")))
      .select("id", "gram").distinct())
    val in =
      if (maxPosting == Int.MaxValue) grams
      // persisted: three branches read it (both self-join sides + the
      // gl totals) — unpersisted, the cap's count aggregate and
      // anti-join re-execute per branch (grams beneath is cached, so
      // only those shuffles were being repeated)
      else CacheHandle.persistWith(handle,
        TextDedup.capBuckets(grams, Seq("gram"), maxPosting))
    // gram totals MUST come from the same capped set as the shared
    // counts: with ga from uncapped grams but shared from capped
    // postings, any pair touching a hot gram could fail the count
    // filter and a TRUE match would be dropped. On the capped
    // universe the Gravano bound stays valid — an edit still destroys
    // at most q grams of the surviving subset — so under a cap the
    // only recall loss is pairs whose EVERY shared gram is hot (they
    // never meet in the posting join at all).
    val gl = in.groupBy("id").agg(count(lit(1)).as("ng"))
    in.select(col("id").as("a"), col("gram"))
      .join(in.select(col("id").as("b"), col("gram")), "gram")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .join(gl.select(col("id").as("a"), col("ng").as("ga")), "a")
      .join(gl.select(col("id").as("b"), col("ng").as("gb")), "b")
      .filter(col("shared") >=
        greatest(col("ga"), col("gb")) - lit(maxDist * q))
      .join(names.select(col("id").as("a"), col("name").as("name_a")), "a")
      .join(names.select(col("id").as("b"), col("name").as("name_b")), "b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "name_a", "name_b", "dist")
  }

  /** EM estimation of the Fellegi–Sunter m/u parameters from UNLABELED
    * candidate pairs (Winkler 1988; the Splink training step): under
    * conditional independence, the agreement-pattern distribution is a
    * two-component mixture, and EM recovers the match proportion λ and
    * per-field m_i = P(agree | match), u_i = P(agree | non-match).
    *
    * Scale stance: the corpus-side work is ONE aggregate collapsing
    * the pair frame into ≤ 2^|fields| pattern counts (bounded by
    * construction — the collect is 8 rows for 3 fields); every EM
    * round is driver-side scalar arithmetic on those counts, zero
    * additional jobs. At 100 TB the cost is the one pattern exchange.
    *
    * Cross-engine exactness (the oracle replays the identical
    * recursion in unrolled CTEs): EM here uses ONLY +,−,×,÷ — no
    * transcendental drift anywhere. Pattern sums are accumulated as
    * exact DECIMAL(28,14) (BigDecimal HALF_UP per term — the
    * QualityModel gradient treatment), so accumulation order cannot
    * move a round's result; pm/pu products are associated
    * ((f1·f2)·f3) and the SQL mirrors that textually. The one
    * residual engine surface is the decimal→double conversion of
    * each round's sums: once a sum exceeds 2^53 UNSCALED units
    * (value ≳ 90, e.g. λ·N at large N), the two engines' conversion
    * paths may differ by 1 ulp — ~8 orders below the round(…,6)
    * output fence (the QualityModel exp() precedent), not
    * bit-identity. Everything below the conversion is exact.
    *
    * `pairs` must carry one 0/1 integer column per field. Returns
    * (λ, m, u) after `iters` rounds from the literal inits.
    */
  def linkageEm(
      pairs: DataFrame,
      gCols: Seq[String],
      iters: Int,
      lam0: Double = 0.1,
      m0: Double = 0.85,
      u0: Double = 0.15): (Double, Array[Double], Array[Double]) = {
    require(gCols.nonEmpty && gCols.size <= 8,
      s"1..8 agreement fields, got ${gCols.size}")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the band (not just the open interval): an init near the edge
    // can round every 14dp E-step term of one mixture side to zero,
    // and 0/0 would surface as silent NaN parameters
    def inBand(x: Double) = x >= 1e-6 && x <= 1.0 - 1e-6
    require(inBand(lam0) && inBand(m0) && inBand(u0),
      s"inits must lie in [1e-6, 1-1e-6]: lam0=$lam0 m0=$m0 u0=$u0")
    val k = gCols.size
    val counts = pairs
      .groupBy(gCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .collect() // bounded by construction: <= 2^k rows
      .map(r => (gCols.indices.map(i => r.getInt(i)).toArray,
        r.getLong(k)))
    require(counts.nonEmpty, "cannot run EM on an empty pair frame")
    import java.math.{BigDecimal => JBD, RoundingMode}
    def d14(x: Double): JBD =
      new JBD(x).setScale(14, RoundingMode.HALF_UP)
    var lam = lam0
    var m = Array.fill(k)(m0)
    var u = Array.fill(k)(u0)
    for (_ <- 1 to iters) {
      // exact decimal accumulators — order-independent sums
      var sA, sB = JBD.ZERO
      val sAi = Array.fill(k)(JBD.ZERO)
      val sBi = Array.fill(k)(JBD.ZERO)
      counts.foreach { case (g, n) =>
        // fixed association ((f1·f2)·f3)… — mirrored in the oracle
        var pm = 1.0; var pu = 1.0
        var i = 0
        while (i < k) {
          pm = pm * (if (g(i) == 1) m(i) else 1.0 - m(i))
          pu = pu * (if (g(i) == 1) u(i) else 1.0 - u(i))
          i += 1
        }
        val num = lam * pm
        val w = num / (num + (1.0 - lam) * pu)
        val nd = n.toDouble
        sA = sA.add(d14(w * nd))
        sB = sB.add(d14((1.0 - w) * nd))
        i = 0
        while (i < k) {
          if (g(i) == 1) {
            sAi(i) = sAi(i).add(d14(w * nd))
            sBi(i) = sBi(i).add(d14((1.0 - w) * nd))
          }
          i += 1
        }
      }
      val a = sA.doubleValue; val b = sB.doubleValue
      // named failure instead of 0/0 → NaN: a side losing ALL its
      // mass at 14dp precision means the mixture collapsed (skewed
      // inits or a degenerate pattern table)
      require(a > 0 && b > 0,
        s"EM round degenerated: mixture side mass a=$a b=$b — " +
          "check inits and the agreement-pattern distribution")
      lam = a / (a + b)
      m = sAi.map(_.doubleValue / a)
      u = sBi.map(_.doubleValue / b)
    }
    (lam, m, u)
  }
}
