package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact cosine-threshold pair mining over shingle term-frequency
  * vectors — the AllPairs prefix filter (Bayardo, Ma & Srikant,
  * WWW 2007) re-expressed as Spark equi-joins, completing the exact
  * near-dup family beside the Jaccard PPJoin
  * ([[TextDedup.prefixJaccardPairs]]; cosine and Jaccard catch
  * different duplicate shapes — cosine is insensitive to repetition
  * ratio, Jaccard to weighting).
  *
  * Features are word n-gram shingles WITH multiplicity (tf counts),
  * so the gate-scale 31-token vocabulary still yields a sparse
  * feature space (the shingleN=3 rule). The vector for doc d is its
  * tf vector; cos(a, b) = num / (sqrt(na2) * sqrt(nb2)) with
  * num = Σ_t tf_a(t)·tf_b(t) and na2 = Σ_t tf_a(t)² — ALL-INTEGER
  * numerators, so the threshold decision is the double comparison
  *
  *   num² ≥ τ² · (na2 · nb2)
  *
  * over exactly-representable doubles (each factor < 2^53 — see the
  * contract below), written with the same association on both
  * engines: bit-identical decisions, no boundary-row hash risk.
  *
  * Prefix filter: features take the corpus-wide RARITY total order
  * (df asc, shingle asc — the [[TextDedup]] rank, unique). For each
  * doc, features are scanned in that order with the suffix bound
  * b(i) = Σ_{j ≥ i} ŵ(t_j)·maxŵ(t_j), where ŵ = tf/sqrt(na2) is the
  * unit-normalized weight and maxŵ(t) the corpus maximum. A
  * qualifying pair's EARLIEST shared feature t* must sit in both
  * docs' prefixes: if t* were past a's cut, every shared feature
  * would be in a's suffix and cos(a,b) ≤ Σ_{suffix} ŵ_a·maxŵ < τ.
  * So only features with b(i) ≥ τ are indexed, and candidates come
  * from the prefix-posting self-join — the same lossless
  * prefix-prefix equi-join shape as the Jaccard PPJoin, with the
  * heavy (common) features excluded from candidate generation
  * entirely. The cut bound is computed in doubles ENGINE-LOCALLY
  * (the oracle never sees it), so it only needs to be conservative:
  * a 1e-9 margin keeps it over-inclusive against rounding.
  *
  * Family contracts (the PPJoin rules): hot prefix postings are
  * AUDITED, never capped (a cap would break losslessness) — the
  * audit collect doubles as the prefix frame's eager materializer;
  * survivors verify EXACTLY against the full tf vectors; all joins
  * are key equi-joins; the rank is the two-phase global row number
  * (no single-reducer window).
  *
  * Integer-range contract: na2 ≤ Σ tf² ≤ (doc shingle count)·max_tf²
  * must stay under ~3·10^15 so na2·nb2 and num² are exact in double
  * — any realistically chunked document (≤ ~10^6 shingles) is orders
  * of magnitude inside it.
  *
  * Output: (a, b, num, na2, nb2, cos_r) for pairs with cos ≥ τ,
  * a < b, cos_r rounded to 6 places.
  */
object CosineAllPairs {

  def pairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      handle: CacheHandle = null,
      maxPrefixPosting: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0, 1], got $threshold")
    require(maxPrefixPosting > 0,
      s"maxPrefixPosting must be positive, got $maxPrefixPosting")
    // tf vectors: shingles WITH multiplicity, counted per (doc, shingle)
    val tf = CacheHandle.persistWith(handle,
      TextDedup.shingles(df, idCol, textCol, shingleN, dedup = false)
        .groupBy(idCol, "shingle").agg(count(lit(1)).as("tf")))
    tf.count() // eager: norms, df rank, weights + two verify sides
    val sz = CacheHandle.persistWith(handle,
      tf.groupBy(idCol).agg(sum(col("tf") * col("tf")).as("na2")))
    sz.count() // eager: the weight projection + two final joins
    val wn = tf.join(sz, idCol)
      .select(col(idCol), col("shingle"),
        (col("tf").cast("double") /
          sqrt(col("na2").cast("double"))).as("w"))
    val maxw = wn.groupBy("shingle").agg(max(col("w")).as("maxw"))
    val dfc = tf.groupBy("shingle").agg(count(lit(1)).as("dfc"))
    val ranked = ScaleOps.globalRowNumber(dfc, 8,
        handle, col("dfc"), col("shingle"))
      .select(col("shingle"), col("rn"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("rn")
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol)
    // suffix bound at feature i: tot − cum_before(i); keep while it
    // can still reach τ (1e-9 margin: the cut is engine-local and
    // only needs to be OVER-inclusive — losslessness never rides on
    // a double rounding)
    val pref = CacheHandle.persistWith(handle,
      wn.join(maxw, "shingle").join(ranked, "shingle")
        .withColumn("c", col("w") * col("maxw"))
        .withColumn("cum", sum(col("c")).over(byDoc))
        .withColumn("tot", sum(col("c")).over(whole))
        .filter(col("tot") - (col("cum") - col("c")) >=
          lit(threshold - 1e-9))
        .select(col(idCol), col("shingle")))
    if (maxPrefixPosting == Int.MaxValue)
      pref.count() // eager: both candidate sides read it
    else {
      // audit, not cap (the family rule) — collect doubles as the
      // eager materializer
      val worst = TextDedup.overCapBuckets(pref, Seq("shingle"),
          maxPrefixPosting)
        .orderBy(col("n_members").desc, col("shingle"))
        .limit(1).collect()
      require(worst.isEmpty, {
        val r = worst.head
        s"CosineAllPairs: prefix posting for shingle " +
          s"'${r.getString(0)}' has ${r.getLong(1)} members " +
          s"(> maxPrefixPosting=$maxPrefixPosting) — the candidate " +
          "join would fan out quadratically on it; raise the bound " +
          "if the fan-out is affordable"
      })
    }
    val cand = pref.as("x")
      .join(pref.as("y"), col("x.shingle") === col("y.shingle") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
    // exact verify: integer dot product over the full tf vectors
    val num = cand
      .join(tf.select(col(idCol).as("a"), col("shingle"),
        col("tf").as("tfa")), Seq("a"))
      .join(tf.select(col(idCol).as("b"), col("shingle"),
        col("tf").as("tfb")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(sum(col("tfa") * col("tfb")).as("num"))
    num
      .join(sz.select(col(idCol).as("a"), col("na2")), "a")
      .join(sz.select(col(idCol).as("b"), col("na2").as("nb2")), "b")
      // the engine-portable integer threshold: num² ≥ τ²·(na2·nb2),
      // every factor exact in double, association mirrored verbatim
      // in the oracle
      .filter(col("num").cast("double") * col("num").cast("double") >=
        lit(threshold) * lit(threshold) *
          (col("na2").cast("double") * col("nb2").cast("double")))
      .select(col("a"), col("b"), col("num"), col("na2"), col("nb2"),
        round(col("num").cast("double") /
          (sqrt(col("na2").cast("double")) *
            sqrt(col("nb2").cast("double"))), 6).as("cos_r"))
  }

  /** Nightly-incremental cosine AllPairs — tonight's `batch` exactly
    * threshold-joined against the standing `corpus`
    * ([[TextDedup.prefixJaccardAgainst]]'s shape at cosine
    * semantics): emits every CROSS pair (a ∈ batch, b ∈ corpus) with
    * cos(a, b) ≥ τ over shingle-tf vectors, exactly verified. Only
    * cross pairs — in-batch mining composes with [[pairs]] on the
    * batch alone, and the corpus is assumed already mined.
    *
    * The prefix theorem needs ONE rarity total order spanning both
    * sides (a qualifying pair's earliest shared feature must land in
    * both prefixes under the SAME order), so the rank is computed
    * over corpus ∪ batch — the family's cross-side rule. The
    * cosine-specific hazard the Jaccard family doesn't have: the
    * suffix bound multiplies by maxŵ(t), and a batch doc can RAISE a
    * shingle's max weight above the corpus's — a corpus-only maxŵ
    * would UNDER-include (lossy). maxŵ here is the max over
    * corpus ∪ batch, i.e. greatest(corpus maxŵ, batch maxŵ) per
    * shingle: over-inclusive for each side's bound, never lossy.
    *
    * Internal keys carry a side tag, so id collisions between corpus
    * and batch never conflate norms or verification — the output
    * columns (a, b) are the raw ids per side. The hot-posting audit
    * counts each prefix posting across BOTH sides (that union is what
    * the cross candidate join fans out on — both factors bounded at
    * once, the prefixJaccardAgainst contract).
    *
    * Scale honesty: the union rank re-scans the corpus tfs once per
    * run — exactness of the shared order, not a standing index (the
    * frozen-rank index generalization needs a maxŵ that appends can
    * only RAISE, plus the `_meta` lifecycle — future work; every join
    * here is a key equi-join, so the plan shape carries over).
    *
    * Output: (a, b, num, na2, nb2, cos_r), a ∈ batch, b ∈ corpus.
    */
  def pairsAgainst(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      handle: CacheHandle = null,
      maxPrefixPosting: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0, 1], got $threshold")
    require(maxPrefixPosting > 0,
      s"maxPrefixPosting must be positive, got $maxPrefixPosting")
    val tf = CacheHandle.persistWith(handle,
      TextDedup.shingles(corpus, idCol, textCol, shingleN, dedup = false)
        .select(lit(0).as("__side"), col(idCol), col("shingle"))
        .unionAll(
          TextDedup.shingles(batch, idCol, textCol, shingleN,
            dedup = false)
            .select(lit(1).as("__side"), col(idCol), col("shingle")))
        .groupBy("__side", idCol, "shingle")
        .agg(count(lit(1)).as("tf")))
    tf.count() // eager: norms, df rank, weights + two verify sides
    val sz = CacheHandle.persistWith(handle,
      tf.groupBy("__side", idCol)
        .agg(sum(col("tf") * col("tf")).as("na2")))
    sz.count() // eager: the weight projection + two final joins
    val wn = tf.join(sz, Seq("__side", idCol))
      .select(col("__side"), col(idCol), col("shingle"),
        (col("tf").cast("double") /
          sqrt(col("na2").cast("double"))).as("w"))
    // union max = greatest(corpus maxw, batch maxw) per shingle — the
    // cosine-specific cross contract (a corpus-frozen maxw would be
    // LOSSY for batch-raised weights)
    val maxw = wn.groupBy("shingle").agg(max(col("w")).as("maxw"))
    val dfc = tf.groupBy("shingle").agg(count(lit(1)).as("dfc"))
    val ranked = ScaleOps.globalRowNumber(dfc, 8,
        handle, col("dfc"), col("shingle"))
      .select(col("shingle"), col("rn"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("__side", idCol).orderBy("rn")
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy("__side", idCol)
    val pref = CacheHandle.persistWith(handle,
      wn.join(maxw, "shingle").join(ranked, "shingle")
        .withColumn("c", col("w") * col("maxw"))
        .withColumn("cum", sum(col("c")).over(byDoc))
        .withColumn("tot", sum(col("c")).over(whole))
        .filter(col("tot") - (col("cum") - col("c")) >=
          lit(threshold - 1e-9))
        .select(col("__side"), col(idCol), col("shingle")))
    if (maxPrefixPosting == Int.MaxValue)
      pref.count() // eager: both candidate sides read it
    else {
      val worst = TextDedup.overCapBuckets(pref, Seq("shingle"),
          maxPrefixPosting)
        .orderBy(col("n_members").desc, col("shingle"))
        .limit(1).collect()
      require(worst.isEmpty, {
        val r = worst.head
        s"CosineAllPairs.pairsAgainst: prefix posting for shingle " +
          s"'${r.getString(0)}' has ${r.getLong(1)} members across " +
          s"corpus+batch (> maxPrefixPosting=$maxPrefixPosting) — the " +
          "cross candidate join would fan out on it; raise the bound " +
          "if the fan-out is affordable"
      })
    }
    val cand = pref.filter(col("__side") === 1)
      .select(col(idCol).as("a"), col("shingle"))
      .join(pref.filter(col("__side") === 0)
        .select(col("shingle"), col(idCol).as("b")), Seq("shingle"))
      .select(col("a"), col("b"))
      .distinct()
    val num = cand
      .join(tf.filter(col("__side") === 1)
        .select(col(idCol).as("a"), col("shingle"),
          col("tf").as("tfa")), Seq("a"))
      .join(tf.filter(col("__side") === 0)
        .select(col(idCol).as("b"), col("shingle"),
          col("tf").as("tfb")), Seq("b", "shingle"))
      .groupBy("a", "b").agg(sum(col("tfa") * col("tfb")).as("num"))
    num
      .join(sz.filter(col("__side") === 1)
        .select(col(idCol).as("a"), col("na2")), "a")
      .join(sz.filter(col("__side") === 0)
        .select(col(idCol).as("b"), col("na2").as("nb2")), "b")
      .filter(col("num").cast("double") * col("num").cast("double") >=
        lit(threshold) * lit(threshold) *
          (col("na2").cast("double") * col("nb2").cast("double")))
      .select(col("a"), col("b"), col("num"), col("na2"), col("nb2"),
        round(col("num").cast("double") /
          (sqrt(col("na2").cast("double")) *
            sqrt(col("nb2").cast("double"))), 6).as("cos_r"))
  }
}
