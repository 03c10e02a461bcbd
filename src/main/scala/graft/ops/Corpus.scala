package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation building blocks for a training-data pipeline:
  * deterministic sampling, incremental (batch-vs-corpus) dedup, and the
  * composed quality→dedup keep/drop decision. Like [[TextDedup]], the
  * declared queries in [[graft.queries.CorpusQueries]] are thin
  * wrappers, so library users and the oracle gate run the same code.
  *
  * Scale stance:
  *  - sampling is a pure per-row filter — no shuffle, no state, and
  *    (being md5-derived, not `rand()`) reproducible under task retry
  *    and across backfills, which `df.sample` is not;
  *  - incremental dedup is one keyed anti-join on the fingerprint —
  *    the nightly "drop what the corpus already has" shape; AQE picks
  *    broadcast vs shuffled-hash by the corpus side's actual size;
  *  - curation is scan + one hash exchange (the fingerprint window) —
  *    quality gates are evaluated before the shuffle so only surviving
  *    rows are exchanged.
  */
object Corpus {

  /** Canonical stopword list for the quality gates — the single
    * definition behind both the per-document q_quality scoring and the
    * composed q_curate decision (and their DuckDB oracles), so the two
    * queries cannot silently disagree on what passes.
    */
  val defaultStopWords: Seq[String] = Seq("the", "a", "data", "row", "key")

  /** The engine-portable hash-mod idiom — first 8 hex chars of
    * md5(input) as a long, mod `m` — shared by hash sampling
    * ([[hashBucket]]), feature hashing ([[hashingTf]]) and span
    * corruption ([[spanCorruptionPlan]]). ONE definition pins the
    * cross-engine contract the DuckDB oracles mirror textually
    * (8 hex chars = 32 bits so the long never overflows, base-16
    * conv, long cast, then mod); a drive-by change at one call site
    * can no longer diverge the others from their oracles.
    */
  def hashMod(input: Column, m: Long): Column =
    conv(substring(md5(input), 1, 8), 16, 10).cast("long") % m

  /** Deterministic sampling bucket in [0, 100): md5 of `salt:id`.
    * Same formula as the DuckDB oracle side; stable across engines,
    * retries, and runs — the property that makes hash sampling the
    * standard over `rand()` in data pipelines.
    */
  def hashBucket(idCol: Column, salt: String): Column =
    hashMod(concat(lit(s"$salt:"), idCol.cast("string")), 100)

  /** Stratified deterministic sample: keep a row when its hash bucket
    * falls under its stratum's percentage rate. `rates` maps stratum
    * value → percent in [0, 100]; unlisted strata get `defaultRate`.
    */
  def hashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Int],
      defaultRate: Int,
      salt: String = "smpl"): DataFrame = {
    require(!df.columns.contains("bucket"),
      "input already has a 'bucket' column (it would be overwritten)")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .filter(col("bucket") < rate)
  }

  /** Exact-N deterministic sample per stratum: rank rows inside each
    * stratum by a salted md5 of the id (ties broken by the id itself
    * — a total order, so retry/backfill-stable like [[hashSample]])
    * and keep `sample_rank` <= n. The eval-set construction shape:
    * "exactly 10k docs per source", where a rate-based sample only
    * lands NEAR the quota.
    *
    * Scale stance: exactness costs a per-stratum sort (one hash
    * exchange on the stratum + a window). That is the honest price of
    * an exact quota; when "about p percent" is acceptable,
    * [[hashSample]] is the shuffle-free path. Strata counts are
    * usually ≤ thousands, so the exchange is wide, not deep; a single
    * mega-stratum is the skew risk — pre-split it into salted
    * sub-strata and take n/k from each, which this op composes with
    * (call it on the salted column).
    */
  def sampleExactPerStratum(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      salt: String = "exact"): DataFrame = {
    val key = md5(concat_ws(":", lit(salt), col(idCol).cast("string")))
    // two-phase: a FIXED-DOMAIN stratum (source, lang) makes every
    // window partition corpus/|strata| rows through one reducer — the
    // funnel the unpartitioned-window tripwire can't see. A local
    // per-(stratum, input-partition) top-n prunes first: any global
    // top-n member is also in its own partition's local top-n, so the
    // final keyed window ranks ≤ n·partitions survivors and emits
    // IDENTICAL ranks.
    val wLocal = Window
      .partitionBy(col(strataCol), spark_partition_id())
      .orderBy(key, col(idCol))
    val pruned = df.withColumn("__lr", row_number().over(wLocal))
      .filter(col("__lr") <= n).drop("__lr")
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
    pruned.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }

  /** Incremental dedup: fingerprint groups of `batch` that do NOT
    * already exist in `corpus` — (fp, keep_id, n_batch). Keeps the
    * smallest id per new group (in-batch dedup) and anti-joins the
    * corpus fingerprint set (cross-batch dedup). This is the nightly
    * ingest shape: the corpus side never rewrites, only its
    * fingerprint set is read.
    */
  def incrementalDedup(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val fp = (c: Column) => md5(TextDedup.normText(c))
    val corpusFp = corpus.select(fp(col(textCol)).as("fp")).distinct()
    batch.select(col(idCol), fp(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_batch"))
      .join(corpusFp, Seq("fp"), "left_anti")
  }

  /** The quality-gate predicate — ONE definition shared by [[curate]]
    * and the streaming curation query, so batch and stream gates
    * cannot drift (the same reason [[defaultStopWords]] is a single
    * constant). Null text fails the gate; token count is never zero
    * for non-null text (`split` yields [""] at minimum), so the stop
    * ratio cannot divide by zero under ANSI.
    */
  def qualityPass(
      textCol: Column,
      stopWords: Seq[String] = defaultStopWords,
      minLen: Int = 20,
      maxLen: Int = 2000,
      minTokens: Int = 5,
      maxStopRatio: Double = 0.5): Column = {
    val tk = TextDedup.tokens(textCol)
    val nStop = size(filter(tk, x => x.isInCollection(stopWords)))
    length(textCol).between(minLen, maxLen) &&
      size(tk) >= minTokens &&
      (nStop.cast("double") / size(tk).cast("double")) <= maxStopRatio
  }

  /** Repetition stats per document (the Gopher-style quality rule):
    * word-bigram total/distinct counts and the duplicated fraction.
    * Machine-generated and boilerplate text repeats locally, so this
    * catches junk without any dedup pass. Documents with fewer than 2
    * tokens are dropped (no bigram, and the ratio would divide by
    * zero under ANSI). Pure scan + explode + one keyed aggregate.
    */
  def repetitionStats(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    TextDedup.shingles(df, idCol, textCol, n = 2, dedup = false)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("shingle")).as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_bigrams").cast("double"), 6))

  /** Benchmark decontamination: training documents sharing at least
    * `minOverlap` distinct word n-grams with ANY benchmark document,
    * with the shared-n-gram count — the eval-set leakage gate every
    * training pipeline runs before a corpus ships. Production systems
    * use long n-grams (8-13) so only verbatim leakage trips the gate;
    * short n-grams over a small vocabulary flag everything.
    *
    * Scale stance: the benchmark side is an eval set — thousands of
    * documents against a 100 TB corpus — so its distinct shingle set
    * is broadcast and the corpus side is a scan + explode with no
    * pre-join shuffle; only MATCHING (train-doc, shingle) rows reach
    * the per-document count exchange, and matches are rare by
    * construction at production n-gram lengths.
    *
    * PRECONDITION — the broadcast() is deliberate and UNCONDITIONAL
    * (the hint never degrades, per the repo broadcast rule):
    * `benchmark` must be eval-set-sized (its distinct shingles fit an
    * executor — tens of MB). It does NOT grow with the train corpus,
    * which is what the no-hint rule protects against; but a caller
    * "decontaminating" one corpus slice against another corpus-sized
    * slice is outside this operator's contract — use the
    * [[TextDedup]] posting-join shapes for corpus-vs-corpus overlap.
    */
  def decontaminate(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    val benchShingles = TextDedup.shingles(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct()
    // join raw (dedup = false) shingles FIRST, then distinct only the
    // matches: dedup-before-join would exchange the whole exploded
    // corpus; dedup-after-join exchanges only the rare surviving rows,
    // so nothing shuffles before the broadcast filter (plan-pinned)
    TextDedup.shingles(train, idCol, textCol, n, dedup = false)
      .join(broadcast(benchShingles), Seq("shingle"))
      .select(col(idCol), col("shingle")).distinct()
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minOverlap)
  }

  /** Contamination severity report: for every flagged training
    * document, how MUCH of it leaks — (idCol, n_shingles, n_hits,
    * contam_frac = n_hits / n_shingles over its distinct word
    * n-grams). [[decontaminate]] answers "which docs"; this answers
    * "drop or just redact" (a 0.9 fraction is a benchmark copy, a
    * 0.02 fraction is one quoted sentence).
    *
    * Scale stance: the fraction needs each flagged doc's TOTAL
    * distinct-shingle count, which over the whole train side would
    * mean exchanging the exploded corpus — precisely what
    * [[decontaminate]] avoids. So it runs two-phase: flag first
    * (broadcast filter, matches only), then compute sizes for the
    * FLAGGED docs alone — a rare-by-construction slice at production
    * n-gram lengths.
    */
  def contaminationReport(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    val hits = decontaminate(train, benchmark, idCol, textCol, n,
      minOverlap)
    val flagged = train.join(hits.select(col(idCol)), Seq(idCol),
      "left_semi")
    val sizes = TextDedup.shingles(flagged, idCol, textCol, n)
      .groupBy(idCol).agg(count(lit(1)).as("n_shingles"))
    hits.join(sizes, Seq(idCol))
      .select(col(idCol),
        col("n_shingles").cast("long").as("n_shingles"),
        col("n_hits").cast("long").as("n_hits"),
        round(col("n_hits").cast("double") /
          col("n_shingles").cast("double"), 6).as("contam_frac"))
  }

  /** The keep set after decontamination: `train` minus every flagged
    * document (one broadcast semi-shape anti-join on the id).
    */
  def decontaminatedKeep(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minOverlap: Int = 1): DataFrame =
    train.join(
      decontaminate(train, benchmark, idCol, textCol, n, minOverlap)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Materialize the standing corpus's fingerprint set as a bucketed,
    * fp-sorted table — the layout half of zero-exchange incremental
    * dedup. Run once per corpus rebuild (or append tonight's new
    * fingerprints); every nightly [[incrementalDedupBucketed]] then
    * anti-joins against it with NO exchange on the corpus side. At
    * 100 TB the corpus fingerprint set is the big side of that join —
    * re-shuffling it every night is exactly the cost this layout
    * removes ([[ScaleOps.writeBucketed]] is the generic form).
    */
  def writeCorpusFingerprints(
      corpus: DataFrame,
      textCol: String,
      table: String,
      buckets: Int,
      path: Option[String] = None): Unit =
    ScaleOps.writeBucketed(
      corpus.select(md5(TextDedup.normText(col(textCol))).as("fp")).distinct(),
      table, "fp", buckets, path)

  /** Append tonight's ACCEPTED documents' fingerprints into the
    * standing bucketed table written by [[writeCorpusFingerprints]] —
    * the incremental half of the exact-dedup lifecycle (the
    * [[TextDedup.appendPrefixIndex]] counterpart): tomorrow's
    * [[incrementalDedupBucketed]] then sees tonight's accepted docs
    * without a corpus rebuild. Accepted docs passed exact dedup
    * against this very table, so their fingerprints are genuinely
    * new; distinct-within-batch keeps the table a set.
    */
  def appendCorpusFingerprints(
      accepted: DataFrame,
      textCol: String,
      table: String,
      buckets: Int): Unit =
    ScaleOps.appendBucketed(
      accepted.select(md5(TextDedup.normText(col(textCol))).as("fp"))
        .distinct(),
      table, "fp", buckets)

  /** [[incrementalDedup]] against a bucketed fingerprint table written
    * by [[writeCorpusFingerprints]]: same output, but the corpus side
    * scans pre-partitioned on `fp` — only tonight's (small) batch
    * aggregate shuffles, into the corpus's bucket layout. The nightly
    * ingest shape at scale (spec-pinned: zero Exchange above the
    * bucketed scan).
    */
  def incrementalDedupBucketed(
      spark: org.apache.spark.sql.SparkSession,
      fpTable: String,
      batch: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    batch
      .select(col(idCol), md5(TextDedup.normText(col(textCol))).as("fp"))
      .groupBy("fp")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_batch"))
      .join(spark.table(fpTable), Seq("fp"), "left_anti")

  /** Composed curation decision: quality gates (length / token count /
    * stopword ratio) then exact dedup keeping the smallest surviving
    * id per fingerprint. Output: one row per kept document with its
    * stats. Gates run before the fingerprint exchange so dropped rows
    * never shuffle.
    */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopWords: Seq[String],
      minLen: Int = 20,
      maxLen: Int = 2000,
      minTokens: Int = 5,
      maxStopRatio: Double = 0.5): DataFrame = {
    // mirror hashSample's 'bucket' guard: a pre-existing column with a
    // generated name would duplicate the output column and make the
    // fingerprint Window.partitionBy ambiguous
    val generated = Seq("fp", "n_tokens", "n_stop", "len_text", "__rn")
    val clash = df.columns.filterNot(_ == textCol).intersect(generated)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with curate()'s " +
        "generated columns (fp, n_tokens, n_stop, len_text, __rn)")
    val tk = TextDedup.tokens(col(textCol))
    // gate FIRST (the shared predicate, ahead of even the projection),
    // stats kept only for the survivors' output columns
    val projected = df.filter(qualityPass(col(textCol), stopWords,
        minLen, maxLen, minTokens, maxStopRatio))
      .select(df.columns.filterNot(_ == textCol).toIndexedSeq.map(col) :+
        size(tk).as("n_tokens") :+
        size(filter(tk, x => x.isInCollection(stopWords))).as("n_stop") :+
        length(col(textCol)).as("len_text") :+
        md5(TextDedup.normText(col(textCol))).as("fp"): _*)
    // keep-smallest-id per fingerprint as a GROUPED ARGMIN (CLAUDE.md:
    // == the row_number()=1 of the same order, with map-side partial
    // combine) — the previous window sorted every copy of a hot
    // duplicate group through ONE reducer, and dedup input is
    // duplicate-heavy by definition. `min_by` (not min(struct(ALL
    // cols))) so only the ORDERING key needs to be orderable — a
    // MapType payload column deduped fine under the old window and
    // must keep doing so. With `idCol` unique (a document key) the
    // choice is total; duplicate ids within a fingerprint would make
    // the surviving PAYLOAD row arbitrary among those id-ties.
    val valueCols = projected.columns.filterNot(c => c == "fp").toSeq
    projected.groupBy("fp")
      .agg(min_by(struct(valueCols.map(col): _*), col(idCol)).as("__w"))
      .select(valueCols.map(n => col(s"__w.$n")) :+ col("fp"): _*)
      .select((projected.columns.toSeq.filterNot(_ == "n_stop")).map(col): _*)
  }

  /** Deterministic train/val/test assignment: the same md5 bucket as
    * [[hashSample]] (salt-isolated so a document's split is
    * independent of any sampling decision), cut at cumulative
    * percents. `splits` lists (name, percent) in priority order and
    * must sum to 100, so every row gets exactly one split. Pure
    * per-row projection — no shuffle, reproducible across engines,
    * retries, and backfills, and stable as the corpus grows (adding
    * documents never moves an existing one between splits — the
    * property `orderBy(rand).limit(n)` splits lack).
    */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Int)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100 &&
      splits.forall(_._2 > 0),
      s"split percents must be positive and sum to 100, got $splits")
    require(!df.columns.contains("bucket") && !df.columns.contains("split"),
      "input already has a 'bucket' or 'split' column")
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val b = hashBucket(col(idCol), salt)
    val assign = splits.zip(cuts).foldRight(lit(null).cast("string")) {
      case (((name, _), cut), acc) => when(b < cut, lit(name)).otherwise(acc)
    }
    df.withColumn("bucket", b).withColumn("split", assign)
  }

  /** PII scrubbing rules: (pattern, replacement token). The patterns
    * use only regex constructs whose semantics agree between Java
    * regex and RE2-family engines (character classes, bounded
    * repetition, `\b`) so redaction counts can be oracle-checked
    * cross-engine. Order matters: emails are redacted before bare
    * hostname-ish tokens could match anything else.
    */
  val defaultPiiRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}\\b", "<IBAN>"))

  /** Apply `rules` left-to-right, each as a global regex replace.
    * Scale stance: a codegen'd per-row projection — no shuffle, no
    * state; the regexes compile once per task via Spark's
    * `regexp_replace` pattern cache.
    */
  def redactPii(c: Column, rules: Seq[(String, String)] = defaultPiiRules)
      : Column =
    rules.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Temperature-scaled domain-mixture weights (the multilingual /
    * multi-source sampling rule p_i ∝ f_i^α with α = 0.5): per
    * stratum, document and token totals and the normalized sqrt-scaled
    * sampling weight. Down-weights dominant domains without starving
    * rare ones. `sqrt` (not `pow(x, 0.5)`) on both engines — sqrt is
    * IEEE-correctly-rounded, pow is not, and the oracle hash-compares
    * the rounded weights.
    *
    * Scale stance: one keyed aggregate over the corpus; the
    * normalization total is a 1-row broadcast cross join (the q_funnel
    * idiom), never a single-partition window.
    */
  def domainMixture(
      df: DataFrame,
      strataCol: String,
      tokenCountCol: Column): DataFrame = {
    val per = df.groupBy(strataCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCountCol.cast("long")).as("n_tokens"))
      .withColumn("w_raw", sqrt(col("n_tokens").cast("double")))
    val total = per.agg(sum(col("w_raw")).as("w_total"))
    per.crossJoin(broadcast(total))
      .withColumn("weight", round(col("w_raw") / col("w_total"), 6))
      .drop("w_raw", "w_total")
  }

  /** Unigram language-model score per document: the corpus-frequency
    * negative mean log-likelihood `avg(-ln(count(tok)/total))` —
    * the classic cheap perplexity proxy for quality filtering (docs
    * of rare/garbage tokens score high, boilerplate scores low).
    *
    * Scale stance: one explode feeds both the vocabulary aggregate
    * and the scoring join, so it is persisted (pass a [[CacheHandle]]
    * to own the lifecycle); the vocabulary join carries NO broadcast
    * hint — AQE broadcasts it when its measured size fits and shuffles
    * otherwise (a corpus-sized vocab must never be forced onto the
    * driver). The standing-corpus path that avoids the vocabulary
    * shuffle entirely is [[writeVocabulary]] +
    * [[unigramLogProbAgainst]] (bucketed layout).
    */
  def unigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      handle: CacheHandle = null): DataFrame = {
    val toks = CacheHandle.persistWith(handle,
      df.select(col(idCol), explode(TextDedup.tokens(col(textCol))).as("tok")))
    // vocab is read twice (the scoring join build and the 1-row
    // total); persisting it keeps the second read from re-aggregating
    // the full exploded token cache
    val vocab = CacheHandle.persistWith(handle,
      toks.groupBy("tok").agg(count(lit(1)).as("cnt")))
    val total = vocab.agg(sum("cnt").as("total"))
    // the vocabulary grows with the corpus (10^8–10^9 distinct tokens
    // at 100 TB): NO broadcast() hint, AQE decides by measured size
    // (see CLAUDE.md: broadcast-hint rule). The zero-vocab-shuffle
    // path for standing corpora is [[writeVocabulary]] +
    // [[unigramLogProbAgainst]]. Only the 1-row total keeps its hint
    // (genuinely bounded).
    toks
      .join(vocab.crossJoin(broadcast(total)), Seq("tok"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        round(avg(-log(col("cnt").cast("double") /
          col("total").cast("double"))), 6).as("nll"))
  }

  /** Materialize the standing corpus's unigram vocabulary as a
    * tok-bucketed table — the layout half of incremental LM scoring
    * ([[unigramLogProbAgainst]]), exactly the
    * [[writeCorpusFingerprints]] pattern: rebuild once per corpus
    * refresh, then every nightly batch scores against it with no
    * exchange on the vocabulary side.
    */
  def writeVocabulary(
      corpus: DataFrame,
      textCol: String,
      table: String,
      buckets: Int): Unit =
    ScaleOps.writeBucketed(
      corpus.select(explode(TextDedup.tokens(col(textCol))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt")),
      table, "tok", buckets)

  /** [[unigramLogProb]] of `batch` against an EXTERNAL vocabulary
    * (tok, cnt) — the nightly shape: the standing corpus's LM scores
    * tonight's arrivals without re-aggregating the corpus. Batch
    * tokens the vocabulary has never seen count as `n_oov` and are
    * excluded from the mean (no smoothing — the oracle must be exact);
    * documents with zero known tokens drop.
    */
  def unigramLogProbAgainst(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame): DataFrame = {
    val total = vocab.agg(sum("cnt").as("total"))
    batch
      .select(col(idCol), explode(TextDedup.tokens(col(textCol))).as("tok"))
      .join(vocab, Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        count(when(col("cnt").isNull, lit(1))).cast("long").as("n_oov"),
        round(avg(when(col("cnt").isNotNull,
          -log(col("cnt").cast("double") / col("total").cast("double")))), 6)
          .as("nll"))
      .filter(col("nll").isNotNull)
  }

  /** Bigram-LM quality score: per document, the corpus-conditional
    * negative mean log-likelihood `avg(-ln(c(w1 w2) / c(w1 ·)))` over
    * its word bigrams — the second-order companion to
    * [[unigramLogProb]] (catches unusual word ORDER, not just unusual
    * words; scrambled/templated text scores high even when its
    * unigrams are common). Documents with fewer than 2 tokens drop
    * (no bigram).
    *
    * Scale stance: one explode feeds the bigram counts and the scoring
    * join (persisted — pass a [[CacheHandle]]); the bigram vocabulary
    * aggregates map-side, and the prefix counts derive from the bigram
    * counts, never from a second corpus pass. Neither join carries a
    * broadcast hint — a bigram vocab grows even faster than the
    * unigram one; strategy is left to AQE (see CLAUDE.md:
    * broadcast-hint rule).
    */
  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      handle: CacheHandle = null): DataFrame = {
    val bg = CacheHandle.persistWith(handle,
      TextDedup.shingles(df, idCol, textCol, n = 2, dedup = false))
    val bgCounts = CacheHandle.persistWith(handle,
      bg.groupBy("shingle").agg(count(lit(1)).as("cnt")))
    val prefixCounts = bgCounts
      .withColumn("w1", substring_index(col("shingle"), " ", 1))
      .groupBy("w1").agg(sum("cnt").as("pcnt"))
    bg
      .join(bgCounts, Seq("shingle"))
      .withColumn("w1", substring_index(col("shingle"), " ", 1))
      .join(prefixCounts, Seq("w1"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(-log(col("cnt").cast("double") /
          col("pcnt").cast("double"))), 6).as("nll2"))
  }

  /** Overlapping fixed-size token chunks per document (the
    * RAG/context-window chunking shape): windows of `size` tokens
    * every `size - overlap` positions. Chunk starts run while
    * `start <= max(1, n_tokens - overlap)`, so a document shorter
    * than `size` yields exactly one chunk and no trailing chunk is
    * ever fully contained in its predecessor. Output: (idCol,
    * chunk_idx from 0, chunk text, chunk token count).
    *
    * Scale stance: pure scan + explode — per-row arithmetic, no
    * shuffle, no state; chunk count per doc is ~n/(size-overlap).
    */
  def chunkTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      size: Int,
      overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    df.select(col(idCol), TextDedup.tokens(col(textCol)).as("__t"))
      .filter(org.apache.spark.sql.functions.size(col("__t")) >= 1)
      .select(col(idCol),
        explode(expr(
          s"""transform(
                sequence(1, greatest(1, size(__t) - $overlap), $step),
                s -> struct(
                  cast((s - 1) div $step as long) as chunk_idx,
                  array_join(slice(__t, s, $size), ' ') as chunk,
                  size(slice(__t, s, $size)) as n_chunk_tokens))"""))
          .as("c"))
      .select(col(idCol), col("c.chunk_idx"), col("c.chunk"),
        col("c.n_chunk_tokens"))
  }

  /** Epoch-weighted repetition plan — the "data recipe" a training run
    * materializes when sources get different epoch counts (wiki seen
    * 2.5×, web 0.5×, …): one output row per (document, copy).
    * Weights are hundredths of an epoch per stratum (250 = 2.5
    * epochs); the integer part repeats every doc, the fractional part
    * is resolved per doc by the deterministic md5 bucket — so the
    * plan is integer arithmetic end to end and retry/backfill-stable
    * like [[hashSample]], and the realized per-stratum epoch count
    * converges to weight/100 by construction.
    */
  def repeatPlan(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weightsX100: Map[String, Int],
      defaultX100: Int,
      salt: String = "rep"): DataFrame = {
    require((weightsX100.values ++ Seq(defaultX100)).forall(_ >= 0),
      "weights must be >= 0")
    val w = weightsX100.foldLeft(lit(defaultX100)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("__w", w)
      .withColumn("__n", expr("__w div 100").cast("long") +
        when(hashBucket(col(idCol), salt) < col("__w") % 100, 1L)
          .otherwise(0L))
      .filter(col("__n") >= 1)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("__n"))))
      .select(col(idCol), col(strataCol), col("copy_idx"))
  }

  /** GPT-style sequence-packing manifest: documents are concatenated
    * in `idCol` order and chopped into fixed `window`-token training
    * sequences (the concat-and-chop packing every autoregressive
    * pretraining run performs). Emits one row per (sequence, document)
    * span: `seq_id`, the doc id, `doc_tok_start` (first token of the
    * doc inside this sequence), `tok_len` (tokens the doc contributes
    * here), and `seq_off` (where in the sequence the span begins) —
    * enough for a loader to assemble every sequence without re-reading
    * any text. A document longer than `window` spans several
    * sequences; zero/null-token documents contribute nothing.
    *
    * Scale stance: one global prefix sum
    * ([[ScaleOps.globalRunningSum]] — two-phase range partition +
    * broadcast offsets, no single-partition window) and a stateless
    * explode over each doc's spanned sequence range; all arithmetic is
    * exact integers, so the manifest is bit-reproducible.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      window: Int,
      partitions: Int = -1): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val w = window.toLong
    // -1 → session width: a hardcoded 8 made each __pid reducer carry
    // corpus/8 rows — the two-phase shape is only as parallel as this
    val parts = if (partitions > 0) partitions else ScaleOps.fanoutWidth(df)
    ScaleOps.globalRunningSum(
      df.select(col(idCol), col(nTokensCol).cast("long").as("__n")),
      parts, valueCol = "__n", outCol = "__cum", col(idCol))
      .filter(col("__n") > 0)
      .withColumn("__start", col("__cum") - col("__n"))
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div $w"), expr(s"(__cum - 1) div $w"))))
      .select(col("seq_id"), col(idCol),
        greatest(lit(0L), col("seq_id") * w - col("__start"))
          .as("doc_tok_start"),
        (least(col("__cum"), (col("seq_id") + 1) * w) -
          greatest(col("__start"), col("seq_id") * w)).as("tok_len"),
        greatest(lit(0L), col("__start") - col("seq_id") * w)
          .as("seq_off"))
  }

  /** T5-style span-corruption plan: the deterministic masking recipe
    * a denoising-objective loader replays — which token spans of each
    * document get replaced by sentinel ids. The token stream is cut
    * into fixed `block`-token blocks and each FULL block masks one
    * `spanLen`-token span at an md5-derived offset, giving a noise
    * density of exactly spanLen/block over the covered prefix
    * (15% at the 3/20 default) with spans non-overlapping BY
    * CONSTRUCTION (one span per block, offset ≤ block − spanLen).
    * Output: one row per (doc, span) — (idCol, span_idx, tok_start,
    * tok_len) — enough for a loader to rebuild inputs/targets without
    * re-tokenizing twice.
    *
    * Determinism: the offset is the first 8 md5 hex chars of
    * "salt:doc:block" as an integer mod (block − spanLen + 1) — the
    * retry/backfill-stable hash-decision idiom ([[hashBucket]]), no
    * RNG state anywhere. Scale shape: stateless per-doc explode of
    * n_tok/block rows; no shuffle at all until a consumer aggregates.
    */
  def spanCorruptionPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      block: Int = 20,
      spanLen: Int = 3,
      salt: String = "t5"): DataFrame = {
    require(spanLen >= 1 && block > spanLen,
      s"need block > spanLen >= 1, got block=$block spanLen=$spanLen")
    val width = block - spanLen + 1
    df.select(col(idCol),
        size(TextDedup.tokens(col(textCol))).cast("long").as("__n_tok"))
      .withColumn("__blocks", expr(s"__n_tok div $block"))
      .filter(col("__blocks") >= 1)
      .withColumn("span_idx",
        explode(sequence(lit(0L), col("__blocks") - 1)))
      .withColumn("__off",
        hashMod(concat(lit(s"$salt:"), col(idCol).cast("string"),
          lit(":"), col("span_idx").cast("string")), width))
      .select(col(idCol), col("span_idx"),
        (col("span_idx") * block + col("__off")).as("tok_start"),
        lit(spanLen.toLong).as("tok_len"))
  }

  /** DSIR-style importance weights for data selection (importance
    * resampling over hashed n-gram features, after Xie et al. 2023):
    * fit two smoothed bag-of-hashed-token models — the `isTarget`
    * slice (the distribution you want more of) vs the rest — and score
    * every document by its log-likelihood ratio
    * Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)], add-1
    * smoothed over `buckets` hash cells. Positive weight ⇒ the doc
    * looks more target-like than raw-like; a sampler draws ∝ weight,
    * the deterministic gate keeps weight > 0. Output: (idCol,
    * n_tokens, weight_r rounded 6, keep).
    *
    * Scale stance: token explode → one keyed aggregate per bucket
    * (`buckets` rows total — bounded by construction, so the score
    * table broadcast is valid under the hint rule), then one keyed
    * doc aggregate; no self-joins, no state. The per-doc double sum
    * has ≤ doc-token terms (the bounded-terms rule for round(…,6)).
    */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int,
      handle: CacheHandle = null): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    // persisted: the exploded token set feeds BOTH the bucket-count
    // branch and the final scoring join — unpersisted, the corpus
    // scan + explode runs twice (the multi-branch rule)
    val tok = CacheHandle.persistWith(handle, df
      .select(col(idCol), isTarget.as("__t"),
        TextDedup.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 1)
      .select(col(idCol), col("__t"), explode(col("__toks")).as("__tok"))
      .withColumn("__b", Sketches.cmBucket(col("__tok"), 0, buckets)))
    val side = tok.groupBy("__b")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("cq"))
    val tot = side.agg(sum("ct").as("tt"), sum("cq").as("tq"))
    val scores = side.crossJoin(broadcast(tot))
      .select(col("__b"),
        (log((col("ct") + 1).cast("double") /
          (col("tt") + lit(buckets.toLong)).cast("double")) -
          log((col("cq") + 1).cast("double") /
            (col("tq") + lit(buckets.toLong)).cast("double")))
          .as("__score"))
    tok.join(broadcast(scores), "__b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        // + 0.0: the score sum straddles zero by design (keep is its
        // sign), so round can land AT -0.0 on one engine and 0.0 on
        // the other — the computed-zero normalization rule
        (round(sum(col("__score")), 6) + lit(0.0)).as("weight_r"))
      .withColumn("keep", col("weight_r") > 0)
  }

  /** Token-distribution drift between a reference corpus slice and a
    * new slice — the crawl-over-crawl / domain-shift monitor: for
    * every token in the UNION vocabulary, the add-1-smoothed
    * probabilities p_new and p_ref and the token's KL(new‖ref)
    * contribution `p_new * ln(p_new / p_ref)`. Positive contributors
    * are tokens over-represented in the new slice (what changed);
    * summing the column gives the full smoothed KL divergence.
    * Smoothing puts OOV mass on both sides, so the ratio is always
    * finite (and ANSI-safe: denominators are structurally > 0).
    *
    * Output: (tok, c_ref, c_new, p_ref, p_new, kl_contrib) with the
    * probabilities/contribution rounded to 6 dp for cross-engine
    * comparison (ln over a product of two bounded-error doubles —
    * same precision class as the LM scores, see CLAUDE.md's
    * order-dependent-aggregate rule; counts and totals are exact
    * longs).
    *
    * Scale stance: one keyed count aggregate per slice, one full
    * outer equi-join on tok (vocabulary-sized, shuffled — NEVER
    * broadcast, a corpus vocab is unbounded), and the three scalar
    * totals arrive as a 1-row broadcast cross join (the q_funnel
    * idiom). Nothing driver-sized anywhere.
    */
  def tokenDrift(
      ref: DataFrame,
      nw: DataFrame,
      textCol: String = "text"): DataFrame = {
    def cnt(df: DataFrame, as: String): DataFrame =
      df.select(explode(TextDedup.tokens(col(textCol))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as(as))
    val r = cnt(ref, "c_ref")
    val n = cnt(nw, "c_new")
    val joined = r.join(n, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
    val totals = joined.agg(
      sum(col("c_ref")).as("t_ref"),
      sum(col("c_new")).as("t_new"),
      count(lit(1)).as("v"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_ref",
        (col("c_ref") + lit(1)).cast("double") /
          (col("t_ref") + col("v")).cast("double"))
      .withColumn("p_new",
        (col("c_new") + lit(1)).cast("double") /
          (col("t_new") + col("v")).cast("double"))
      .select(col("tok"), col("c_ref"), col("c_new"),
        round(col("p_ref"), 6).as("p_ref_r"),
        round(col("p_new"), 6).as("p_new_r"),
        round(col("p_new") * log(col("p_new") / col("p_ref")), 6)
          .as("kl_contrib"))
  }

  /** Feature-hashing vectorizer (the hashing trick): every token maps
    * to `md5("htf:"||tok) % numFeatures` and the document's sparse TF
    * vector is the per-(doc, bucket) count — fixed dimensionality
    * with no vocabulary pass at all, the property that makes it the
    * cheap featurizer at 100 TB (one exploded keyed aggregate; no
    * vocab build, no vocab join, nothing corpus-sized on any single
    * node). md5-derived buckets (not engine-native hash) keep the
    * assignment portable across engines and retries. Output:
    * (idCol, bucket long, n long), sparse — absent buckets are zero.
    */
  def hashingTf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numFeatures: Int): DataFrame = {
    require(numFeatures > 0, s"numFeatures must be positive: $numFeatures")
    df.select(col(idCol), explode(TextDedup.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("bucket",
        hashMod(concat(lit("htf:"), col("tok")), numFeatures))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Compression-ratio quality signal (the Gopher/RefinedWeb
    * heuristic): `deflate_len / utf8_len` per document — templated or
    * repetitive text compresses far below ~0.5, high-entropy junk
    * sits near 1. Runs as a deterministic JVM kernel (zlib level 6,
    * default strategy — bit-stable across JVMs) over `mapPartitions`
    * batches: one Deflater per PARTITION, reset per row, so the gate
    * pays no per-row allocation. No SQL engine exposes deflate, so
    * the declared query is rows-only; CorpusSpec pins hand-computed
    * lengths and the repetitive≪random ordering.
    *
    * Scale stance: pure per-row projection, no shuffle, CPU-bounded —
    * the classic cheap pre-filter before any LM scoring pass.
    */
  def compressionRatio(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null ids filtered (the primitive-Long encoder throws on null
    // INSIDE the executor task — one poisoned row killed the query
    // with no hint which row); the numeric-id cast is the op contract
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](64 * 1024)
        it.map { case (id, text) =>
          val bytes =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          val ratio =
            if (bytes.isEmpty) 1.0 else n.toDouble / bytes.length
          (id, bytes.length.toLong, n, math.rint(ratio * 1e6) / 1e6)
        }
      }
      .toDF(idCol, "raw_len", "deflate_len", "ratio")
  }

  /** k-anonymity audit over quasi-identifier columns — the privacy
    * companion to [[redactPii]]: group sizes over the quasi-identifier
    * tuple, flagging groups smaller than `k` (those rows are
    * re-identifiable by the combination and need suppression or
    * generalization before release). One keyed count, map-side
    * combined — |distinct tuples| shuffle rows however big the
    * corpus; the release decision is then a semi-join against the
    * flagged tuple set (AQE-sized, typically tiny).
    */
  def kAnonymityReport(
      df: DataFrame,
      quasiIdCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty && k >= 1,
      s"need quasi-id columns and k >= 1, got $quasiIdCols / $k")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("suppress", col("n_rows") < k)
  }

  /** l-diversity audit — [[kAnonymityReport]]'s stronger sibling: a
    * quasi-identifier group can be large (k-anonymous) yet still leak
    * if everyone in it shares the same SENSITIVE value; this flags
    * groups with fewer than `l` distinct sensitive values. One keyed
    * aggregate (count + distinct-count, both map-side partial) —
    * |distinct tuples| shuffle rows however big the corpus.
    */
  def lDiversityReport(
      df: DataFrame,
      quasiIdCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiIdCols.nonEmpty && l >= 1,
      s"need quasi-id columns and l >= 1, got $quasiIdCols / $l")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("suppress", col("n_sensitive") < l)
  }

  /** Keep-latest snapshot merge — the CDC/upsert shape for a
    * re-crawled corpus: among all revisions of each `idCol`, the row
    * with the highest `versionCol` wins (callers whose versions can
    * tie pass a composite, e.g. `struct(version, ingest_ts)`). One
    * keyed window — a single shuffle on the id, no join: the updates
    * batch is just unioned in and the window picks winners, so the
    * nightly merge costs one exchange of corpus+batch keys regardless
    * of how the revisions are spread across waves.
    */
  def upsertLatest(
      revisions: DataFrame,
      idCol: String,
      versionCol: String): DataFrame = {
    require(!revisions.columns.contains("__rev_rn"),
      "input already has a '__rev_rn' column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(versionCol).desc)
    revisions
      .withColumn("__rev_rn", row_number().over(w))
      .filter(col("__rev_rn") === 1)
      .drop("__rev_rn")
  }

  /** SCD Type-2 history build — the warehouse-dimension counterpart of
    * [[upsertLatest]]: instead of keeping only each id's latest row,
    * collapse consecutive revisions with an UNCHANGED `attrCol` and
    * emit one validity interval per change, with `valid_to` = the next
    * change's start (null while current) and an `is_current` flag.
    *
    * Change detection is null-safe (`<=>`): an X→null transition opens
    * a version; a leading null attribute (equal to the implicit
    * pre-history null) does not.
    *
    * Scale shape: two keyed windows (lag for change detection, lead
    * for interval close) over the SAME (id, orderCols) partitioning —
    * one exchange, the second window reuses the first's sort. No
    * joins, no state: the nightly rebuild is a single pass however
    * many revision waves are stacked in the input. `orderCols` must be
    * a total order within each id (pass a tiebreaker column, as
    * q_scd2 does with o_orderkey) or history is nondeterministic.
    */
  def scd2History(
      revisions: DataFrame,
      idCol: String,
      attrCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(orderCols.map(col): _*)
    revisions
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(!(col("__prev") <=> col(attrCol)))
      .drop("__prev")
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Snapshot diff — the change-data-feed summary between two corpus
    * versions: one full-outer hash join on the id comparing content
    * fingerprints, classifying every id as added / removed / changed /
    * unchanged. The row-level output feeds incremental downstream work
    * (re-embed only `changed`, retire `removed`); one exchange of
    * old+new ids however the revisions are distributed.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      fpCol: String): DataFrame = {
    // presence is detected with MARKER columns, not fingerprint
    // nullness: a null fp (md5 of a null text) on a present row would
    // otherwise read as absence — a REMOVED doc with null old text
    // classified "added". A null fp on a both-present row classifies
    // "changed" (unknown content; plain === null-propagates to the
    // otherwise branch — the same semantics as the SQL oracle's =).
    oldSnap.select(col(idCol), col(fpCol).as("__fp_old"),
        lit(true).as("__in_old"))
      .join(newSnap.select(col(idCol), col(fpCol).as("__fp_new"),
        lit(true).as("__in_new")), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__fp_old") === col("__fp_new"), "unchanged")
          .otherwise("changed"))
      .drop("__fp_old", "__fp_new", "__in_old", "__in_new")
  }

  /** Document-level PMI of token pairs: for tokens a<b,
    * pmi = ln( c_ab · n_docs / (c_a · c_b) ) over per-doc DISTINCT
    * token sets — the collocation / topic-coherence statistic.
    *
    * Scale shape: the pair generator is a doc-keyed self-join of the
    * distinct (doc, tok) set — Σ_d C(t_d, 2) candidate rows, quadratic
    * in per-doc DISTINCT vocabulary (not doc length); real corpora cap
    * it by windowing co-occurrence or truncating per-doc vocab before
    * the join. The shared (doc, tok) set is persisted once (self-joins
    * re-execute upstream otherwise — CLAUDE.md), and the token-count
    * joins carry NO broadcast hint: c_t is vocabulary-sized, exactly
    * the aggregate class the round-5 verdict flagged as un-hintable;
    * AQE broadcasts it at gate scale on measured size. Only the 1-row
    * n_docs aggregate is hinted. The double expression is
    * parenthesized identically to the oracle ((c_ab·n)/(c_a·c_b)) so
    * both engines run the same IEEE ops; round(,6) absorbs the ln ulp.
    */
  def pmiPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDocVocab: Int = Int.MaxValue,
      handle: CacheHandle = null): DataFrame = {
    val raw = docs
      .select(col(idCol).as("doc"),
        explode(array_distinct(TextDedup.tokens(col(textCol)))).as("tok"))
    // The pair generator below is Σ_d C(v_d, 2) — quadratic in per-doc
    // DISTINCT vocab: one 1e5-distinct-token document (a dictionary
    // dump, a log file) emits 5e9 pairs on its own. maxDocVocab bounds
    // it by keeping, per doc, the maxDocVocab tokens lowest in
    // (md5(tok), tok) order — deterministic under retry and requiring
    // no corpus-frequency side join, the capBuckets idiom. The capped
    // token set also feeds c_t/n_docs so PMI stays self-consistent on
    // the pruned universe. Int.MaxValue (the gate's setting) skips the
    // window entirely and preserves exact uncapped semantics.
    val capped =
      if (maxDocVocab == Int.MaxValue) raw
      else {
        val w = Window.partitionBy("doc").orderBy(md5(col("tok")), col("tok"))
        raw.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= maxDocVocab)
          .drop("__rk")
      }
    val dt = CacheHandle.persistWith(handle, capped)
    val ct = dt.groupBy("tok").agg(count(lit(1)).as("c_t"))
    val n = dt.agg(countDistinct(col("doc")).as("n_docs"))
    val pairs = dt.select(col("doc"), col("tok").as("tok_a"))
      .join(dt.select(col("doc"), col("tok").as("tok_b")), "doc")
      .filter(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("c_ab"))
    pairs
      .join(ct.select(col("tok").as("tok_a"), col("c_t").as("c_a")), "tok_a")
      .join(ct.select(col("tok").as("tok_b"), col("c_t").as("c_b")), "tok_b")
      .crossJoin(broadcast(n))
      .select(col("tok_a"), col("tok_b"), col("c_ab"),
        round(log(
          (col("c_ab").cast("double") * col("n_docs").cast("double")) /
            (col("c_a").cast("double") * col("c_b").cast("double"))), 6)
          .as("pmi_r"))
  }
}
