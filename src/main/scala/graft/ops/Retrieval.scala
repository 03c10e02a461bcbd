package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-retrieval scoring over the corpus — the search half of a
  * training-data platform (mining relevant documents for a topic,
  * building retrieval eval sets, hybrid rerank pipelines).
  *
  * BM25 here is the standard Robertson/Sparck-Jones form with the
  * +1 idf floor (Lucene-style, never negative):
  * idf = ln(1 + (N - df + 0.5) / (df + 0.5)),
  * score = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).
  *
  * Scale stance: the query term set is tiny, so the exploded corpus
  * filters to it immediately (scan + filter, no shuffle of
  * non-matching tokens); document length and the corpus constants
  * (N, avgdl — exact integer sums, so engine-portable) are 1-row
  * broadcasts; one keyed aggregate per (doc, term) and one per doc.
  * All double math is per-row on exact integers, rounded at the end,
  * so the oracle hash-matches.
  */
object Retrieval {

  /** BM25 scores for every document matching at least one query term:
    * (idCol, n_terms, score_r). `dl`/`avgdl` are whitespace token
    * counts, matching the tokenizer used everywhere else.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      handle: CacheHandle = null): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val docs = df.select(col(idCol),
      TextDedup.tokens(col(textCol)).as("__t"))
    // corpus constants: exact integer sums → identical doubles on any
    // engine (avgdl is one exact division)
    val consts = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("__t")).cast("long")).as("tot_len"))
    // tf (matching docs only — small) feeds both the df aggregate and
    // the scoring join; persisting it keeps the df branch from
    // re-exploding the corpus (pass a CacheHandle to own the cache)
    val tf = CacheHandle.persistWith(handle, docs
      .select(col(idCol), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("tok"))
      .filter(col("tok").isInCollection(terms)) // tiny set: filter at scan
      .groupBy(col(idCol), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("tot_len").cast("double") / col("n_docs")
    val norm = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    // these two broadcast hints are safe at ANY corpus size — unlike
    // a corpus vocabulary, neither side grows with the data: dfreq is
    // an aggregate of tf AFTER the isInCollection(terms) filter, so it
    // has at most terms.size rows, and consts is exactly one row
    // eager (the broadcast-vs-lazy-persist rule): broadcast(dfreq)
    // materializes as its own concurrent driver job reading the LAZY
    // tf cache — both jobs would re-run the corpus explode. One cheap
    // count materializes tf before the broadcast subtree exists.
    tf.count()
    tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(consts))
      .withColumn("term_score",
        idf * col("tf").cast("double") * lit(k1 + 1.0) / norm)
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum(col("term_score")), 6).as("score_r"))
  }

  /** Posting-list inverted index: per token, document frequency,
    * collection frequency, and the first `postingCap` doc ids in
    * ascending order as a CSV string — the classic retrieval index
    * shape (term dictionary + postings head).
    *
    * Scale shape: one (tok, doc) aggregate with map-side combine, then
    * one tok-keyed window to cap postings. For stop-word-grade tokens
    * the window sorts that token's full doc list on one reducer —
    * acceptable while a token's postings fit a partition; a 100-TB
    * stopword row would swap the row_number for the bounded heap of
    * [[graft.expr.TopKByScore]] (same plan shape, O(cap) state). The
    * HOF cast in the posting projection runs interpreted — on ≤cap
    * elements per group, not the scan path.
    */
  def invertedIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      postingCap: Int = 20): DataFrame = {
    require(postingCap >= 1, s"postingCap must be >= 1, got $postingCap")
    val occ = docs
      .select(col(idCol).as("doc"),
        explode(TextDedup.tokens(col(textCol))).as("tok"))
      .groupBy("tok", "doc").agg(count(lit(1)).as("occ"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok")).orderBy(col("doc"))
    occ.withColumn("__rn", row_number().over(w))
      .groupBy("tok")
      .agg(count(lit(1)).as("df"),
        sum(col("occ")).as("cf"),
        array_join(transform(sort_array(collect_list(
          when(col("__rn") <= postingCap, col("doc")))),
          x => x.cast("string")), ",").as("posting"))
  }

  /** Sparse TF-IDF cosine pairs via the posting self-join — the
    * lexical twin of the dense embedding path ([[CosineLsh]] /
    * [[IvfIndex]]): document pairs scored by cosine over tf·idf
    * weighted token vectors, candidates generated ONLY where a shared
    * token exists (the inverted-index join — never an all-pairs
    * product over the corpus).
    *
    * Weights use the q_tfidf formula (tf · ln((N+1)/(df+1))) so the
    * two gates can't drift apart. Documents whose every token has
    * zero idf (all-corpus-wide tokens) get norm 0 and are excluded
    * before the join — ANSI division guard and semantically "no
    * discriminating content".
    *
    * Scale shape: posting join cost is Σ_tok df(tok)² — stop-word
    * grade tokens are the hazard, capped via `maxPosting`
    * ([[TextDedup.capBuckets]]; the gate mirrors the oracle
    * uncapped). Under a cap, norms AND dots both run over the kept
    * posting set, so sim is the true cosine of the kept-token
    * vectors; the only recall loss is pairs whose every shared token
    * is hot (they never meet in the posting join) — the LSH-bucket
    * argument. The dot/norm sums are order-dependent double
    * aggregates over per-pair SHARED tokens — bounded by per-doc
    * vocabulary, the CLAUDE.md bounded-terms condition; `minSim`
    * compares the ROUNDED similarity (round-before-threshold).
    */
  def sparseCosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSim: Double,
      maxPosting: Int = Int.MaxValue,
      handle: CacheHandle = null): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc"),
        explode(TextDedup.tokens(col(textCol))).as("tok"))
      .groupBy("doc", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // vocabulary-sized join side: NO broadcast hint (AQE decides)
    val wtd = CacheHandle.persistWith(handle, tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("w", col("tf").cast("double") *
        log((col("n_docs") + 1).cast("double") / (col("df") + 1)))
      .select(col("doc"), col("tok"), col("w")))
    val in =
      if (maxPosting == Int.MaxValue) wtd
      // persisted: the capped set feeds THREE branches (both self-join
      // sides and the norms) — unpersisted, capBuckets' count
      // aggregate + anti-join re-execute per branch
      else CacheHandle.persistWith(handle,
        TextDedup.capBuckets(wtd, Seq("tok"), maxPosting))
    // norms over the SAME (capped) posting set as the dot: deriving
    // them from the uncapped wtd kept hot-token w² mass in the
    // denominator while the numerator lost it, systematically
    // underestimating every capped pair's similarity (the
    // FuzzyJoin.editDistancePairs capped-totals discipline) — sim is
    // the true cosine over the KEPT tokens
    val norms = in.groupBy("doc")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      .filter(col("nrm") > 0)
    in.select(col("doc").as("a"), col("tok"), col("w").as("wa"))
      .join(in.select(col("doc").as("b"), col("tok"), col("w").as("wb")),
        "tok")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc").as("a"), col("nrm").as("na")), "a")
      .join(norms.select(col("doc").as("b"), col("nrm").as("nb")), "b")
      .withColumn("sim_r", round(col("dot") / (col("na") * col("nb")), 6))
      .filter(col("sim_r") >= minSim)
      .select("a", "b", "sim_r")
  }
}
