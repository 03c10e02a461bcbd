package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Corpus, ScaleOps}

/** Corpus-curation operators over the `documents` table — the
  * pipeline-management family a training-data engine needs around the
  * per-document analyses in [[TextQueries]]: deterministic sampling,
  * incremental (batch-vs-corpus) dedup, the composed quality→dedup
  * keep set, and token-budget shard packing.
  *
  * Portability notes (everything must hash-match DuckDB): sampling
  * buckets and fingerprints are md5-derived (engine-native hashes can
  * never agree); counts that DuckDB widens (`len`, `length`, `sum`)
  * are cast back to the Spark type on the oracle side.
  *
  * Scale stance: sampling is a shuffle-free per-row filter;
  * incremental dedup is one keyed anti-join; curation exchanges only
  * quality-surviving rows; shard packing uses the two-phase prefix-sum
  * (no single-partition window — PlanSpec-pinned).
  */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  // same gate constants as q_quality — one definition in graft.ops
  private val stopWords = Corpus.defaultStopWords

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token-weighted median length per source — the weighted
    // percentile a data card should quote instead of the per-DOC
    // median (half the TOKENS sit in docs at/below this length, so it
    // describes what training actually sees). Entirely integer
    // arithmetic: the within-source prefix sum runs in a partitioned
    // window (distributed by group — no single-partition funnel), the
    // median test is 2·cum ≥ total (no division), and the qualifying
    // row resolves via the aggregate min-struct argmin, not a second
    // sort.
    "q_weighted_median" -> ((s, dir) => {
      val d = docs(s, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = d.groupBy("source").agg(sum("n_chars").as("total"),
        count(lit(1)).as("n_docs"))
      d.withColumn("cum", sum("n_chars").over(w))
        .join(tot, "source")
        .filter(col("cum") * 2 >= col("total"))
        .groupBy("source")
        .agg(min(struct(col("n_chars"), col("doc_id"))).as("m"),
          max("total").as("total_chars"), max("n_docs").as("n_docs"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          col("m.n_chars").as("wmedian_chars"))
        .orderBy("source")
    }),

    // Temperature-based mixture weights (the multilingual-sampling
    // rule of mBERT/XLM-R at T=2): per-language sampling weight
    // ∝ √n_docs, which upsamples low-resource languages relative to
    // proportional sampling without letting the head drown them. √ is
    // the one fractional power that stays engine-exact (sqrt is
    // IEEE correctly-rounded; pow is not — the CLAUDE rule), and the
    // normalizer is a ≤n_langs-term sum. Output: weight, vs the
    // proportional share, and the implied upsampling factor.
    "q_temp_mix" -> ((s, dir) => {
      val g = docs(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .transform(graft.ops.QueryCaches.persist) // totals + per-lang
      g.count() // eager: broadcast(tot) races a lazy cache (CLAUDE.md)
      val tot = g.agg(sum(sqrt(col("n_docs").cast("double"))).as("z"),
        sum("n_docs").as("n_total"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          round(sqrt(col("n_docs").cast("double")) / col("z"), 6)
            .as("w_r"),
          round(col("n_docs").cast("double") /
            col("n_total").cast("double"), 6).as("prop_r"),
          round((sqrt(col("n_docs").cast("double")) / col("z")) /
            (col("n_docs").cast("double") /
             col("n_total").cast("double")), 6).as("boost_r"))
        .orderBy("lang")
    }),

    // URL canonicalization dedup — the web-corpus twin of exact text
    // dedup: crawls see one page under scheme-case / default-port /
    // tracking-param / fragment / trailing-slash variants. Four
    // deterministic variants per page key are synthesized from doc_id
    // (the corpus carries no URL column), then canonicalized with the
    // standard rules — casefold, strip fragment, strip utm_* params,
    // fold http→https, drop the default :443 port, strip the trailing
    // slash — and deduped keep-min-id. Stateless per-row string ops +
    // ONE keyed exchange on the canonical key, the exact-dedup shape.
    "q_url_dedup" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (col("doc_id") % 4).as("vr"),
        expr("doc_id div 4").cast("string").as("g"))
      val url = when(col("vr") === 0,
          concat(lit("https://www.example.com/page/"), col("g")))
        .when(col("vr") === 1,
          concat(lit("HTTP://WWW.EXAMPLE.COM/page/"), col("g"), lit("/")))
        .when(col("vr") === 2,
          concat(lit("https://www.example.com:443/page/"), col("g"),
            lit("?utm_source=feed")))
        .otherwise(
          concat(lit("https://www.example.com/page/"), col("g"),
            lit("#sec")))
      val canon =
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(lower(url), "#.*$", ""),
                "\\?utm_[a-z_]+=[a-z]+$", ""),
              "^http://", "https://"),
            "^https://([^/]+):443/", "https://$1/"),
          "/$", "")
      d.select(canon.as("canon_url"), col("doc_id"))
        .groupBy("canon_url")
        .agg(count(lit(1)).as("n_variants"), min("doc_id").as("keep_id"))
        .orderBy("canon_url")
    }),

    // Mutual-information feature ranking — the feature-selection step
    // before training the quality model: MI(feature; quality label)
    // for each candidate feature (source, lang, length bucket), all
    // from ONE counts aggregate per feature (margins derive from the
    // persisted joint counts, never a second corpus pass). Cell terms
    // are exact-integer ratios; the ≤40-term double sum sits far from
    // the round(…,6) boundary (the bm25/bounded-sum precedent).
    "q_mi_features" -> ((s, dir) => {
      val d = docs(s, dir).select(col("source"), col("lang"),
        expr("n_chars div 100").cast("string").as("lb"),
        Corpus.qualityPass(col("text")).cast("int").as("l"))
      val f = d.select(lit("source").as("feat"), col("source").as("v"),
          col("l"))
        .unionByName(d.select(lit("lang").as("feat"),
          col("lang").as("v"), col("l")))
        .unionByName(d.select(lit("len_bucket").as("feat"),
          col("lb").as("v"), col("l")))
      val cvl = f.groupBy("feat", "v", "l").agg(count(lit(1)).as("cvl"))
        .transform(graft.ops.QueryCaches.persist) // 3 margins + cells
      cvl.count() // eager: margin joins may broadcast against the lazy cache
      val cv = cvl.groupBy("feat", "v").agg(sum("cvl").as("cv"))
      val cl = cvl.groupBy("feat", "l").agg(sum("cvl").as("cl"))
      val n = cvl.groupBy("feat").agg(sum("cvl").as("n"))
      cvl.join(cv, Seq("feat", "v")).join(cl, Seq("feat", "l"))
        .join(n, Seq("feat"))
        .groupBy("feat")
        .agg(count(lit(1)).as("cells"),
          // each count cast to double BEFORE multiplying: the BIGINT
          // products cvl·n and cv·cl overflow (ANSI error, both
          // engines) once the corpus passes ~3e9 docs — the ratio is
          // consumed as a double anyway; the oracle mirrors the
          // double-first association verbatim
          round(sum((col("cvl").cast("double") / col("n").cast("double")) *
            log((col("cvl").cast("double") * col("n").cast("double")) /
              (col("cv").cast("double") * col("cl").cast("double")))), 6)
            .as("mi_r"))
        .orderBy("feat")
    }),

    // Differentially-private release shape: per-(lang, source) counts
    // with Laplace(1/ε=1) noise via the inverse CDF over an
    // md5-derived uniform — a DETERMINISTIC stand-in for the release
    // sampler (retry/backfill-stable, cross-engine reproducible; a
    // production release swaps in a secret seed). Noise costs one
    // per-group expression on the already-aggregated rows; the true
    // count rides along as the gate anchor and is what DP would drop.
    "q_dp_counts" -> ((s, dir) => {
      val g = docs(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("n_true"))
      val u = (conv(substring(md5(concat(lit("dp:"), col("lang"),
        lit(":"), col("source"))), 1, 8), 16, 10).cast("double") +
        lit(0.5)) / lit(4294967296.0)
      val noise = when(u >= 0.5,
          -log(lit(1.0) - lit(2.0) * (u - lit(0.5))))
        .otherwise(log(lit(1.0) - lit(2.0) * (lit(0.5) - u)))
      g.select(col("lang"), col("source"), col("n_true"),
          // + 0.0: deeply negative noise can land noisy_r AT zero —
          // the computed-zero sign-split rule (both sides normalized)
          (round(col("n_true").cast("double") + noise, 6) + lit(0.0))
            .as("noisy_r"))
        .orderBy("lang", "source")
    }),

    // Deterministic stratified sampling: md5-bucket in [0,100), keep
    // 'en' docs at 50%, everything else at 20%. Reproducible under
    // retry/backfill (no rand()); pure filter, no shuffle.
    "q_sample_hash" -> ((s, dir) =>
      Corpus.hashSample(docs(s, dir), "doc_id", "lang",
        rates = Map("en" -> 50), defaultRate = 20)
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy("doc_id")),

    // Incremental dedup: treat doc_id < 250 as the standing corpus and
    // the rest as tonight's batch; emit the batch's new fingerprint
    // groups only (in-batch keep-min + anti-join on the corpus set).
    "q_dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.incrementalDedup(
        corpus = d.filter(col("doc_id") < 250),
        batch = d.filter(col("doc_id") >= 250),
        idCol = "doc_id", textCol = "text")
        .orderBy("fp")
    }),

    // Composed curation: quality gates (q_quality's definitions) then
    // exact dedup keeping the smallest surviving id per fingerprint —
    // the keep set a training pipeline actually materializes.
    "q_curate" -> ((s, dir) =>
      Corpus.curate(
        docs(s, dir).select("doc_id", "lang", "source", "text"),
        "doc_id", "text", stopWords)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("len_text"), col("fp"))
        .orderBy("doc_id")),

    // Token-budget shard packing: inclusive running token total in
    // doc_id order → shard id by 500-token budget. Runs through the
    // two-phase prefix sum — per-partition totals become broadcast
    // offsets; no single-partition window anywhere in the plan.
    "q_pack_shards" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
      ScaleOps.globalRunningSum(base, partitions = 8,
        valueCol = "n_tokens", outCol = "cum_tokens", col("doc_id"))
        .withColumn("shard_id", expr("(cum_tokens - n_tokens) div 500"))
        .select("doc_id", "n_tokens", "cum_tokens", "shard_id")
        .orderBy("doc_id")
    }),

    // DSIR importance weights: every doc scored by the smoothed
    // log-likelihood ratio of its hashed tokens under the
    // target-slice (lang='en') vs raw model — the importance-
    // resampling data-selection shape. 16 hash buckets (the fixed
    // 31-token vocab needs tiny widths to exercise collisions).
    "q_dsir_weights" -> ((s, dir) =>
      Corpus.dsirWeights(docs(s, dir), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 16)
        .orderBy("doc_id")),

    // Distilled quality classifier: logistic regression trained by
    // full-batch GD (5 rounds, lr 0.5, decimal-exact gradient sums —
    // QualityModel) on rule-labeled quality features; output = the
    // trained weights + training accuracy. The oracle unrolls the
    // rounds as materialized CTEs running the identical arithmetic.
    "q_logreg_train" -> ((s, dir) => {
      val feats = graft.ops.QualityModel.featurize(
        docs(s, dir), "doc_id", "text")
      val w = graft.ops.QualityModel.trainLogReg(feats, iters = 5, lr = 0.5)
      graft.ops.QualityModel.scoreLogReg(feats, w)
        .agg(count(lit(1)).cast("long").as("n"),
          round(avg(when(col("pred") === (col("y") > 0.5), 1.0)
            .otherwise(0.0)), 6).as("acc_r"))
        .select(col("n"),
          round(lit(w(0)), 6).as("w0_r"), round(lit(w(1)), 6).as("w1_r"),
          round(lit(w(2)), 6).as("w2_r"), round(lit(w(3)), 6).as("w3_r"),
          col("acc_r"))
    }),

    // The same trained model applied per document: rounded sigmoid
    // score + the stable prediction (thresholding the ROUNDED logit,
    // so an exp() ulp can never flip a boundary row).
    "q_logreg_score" -> ((s, dir) => {
      val feats = graft.ops.QualityModel.featurize(
        docs(s, dir), "doc_id", "text")
      val w = graft.ops.QualityModel.trainLogReg(feats, iters = 5, lr = 0.5)
      graft.ops.QualityModel.scoreLogReg(feats, w)
        .orderBy("doc_id")
    }),

    // Uncertainty sampling — the active-learning selection step: the
    // 20 documents the trained quality model is LEAST sure about
    // (|score − 0.5| smallest) are where a human label buys the most
    // model improvement. One projection over the scored frame + a
    // distributed TakeOrdered; the uncertainty reads the ROUNDED
    // sigmoid, so the cut is ulp-stable.
    "q_uncertainty_sample" -> ((s, dir) => {
      val feats = graft.ops.QualityModel.featurize(
        docs(s, dir), "doc_id", "text")
      val w = graft.ops.QualityModel.trainLogReg(feats, iters = 5,
        lr = 0.5)
      graft.ops.QualityModel.scoreLogReg(feats, w)
        .select(col("doc_id"), col("score_r"),
          round(abs(col("score_r") - lit(0.5)), 6).as("unc_r"))
        .orderBy(col("unc_r"), col("doc_id")).limit(20)
    }),

    // ROC threshold sweep for the trained quality model: TPR/FPR at
    // eleven fixed operating points — the curve a pipeline reads
    // before picking the keep-threshold (q_calibration says whether
    // scores are honest; this says what each cut costs). ONE pass:
    // the 11-point grid explodes map-side onto the scored rows, so
    // the sweep is a single keyed aggregate however many documents
    // exist. Compares read the ROUNDED sigmoid (the logreg-family
    // rule), thresholds are exact binary-representable literals on
    // both engines.
    "q_roc_points" -> ((s, dir) => {
      val feats = graft.ops.QualityModel.featurize(
        docs(s, dir), "doc_id", "text")
      val w = graft.ops.QualityModel.trainLogReg(feats, iters = 5,
        lr = 0.5)
      graft.ops.QualityModel.scoreLogReg(feats, w)
        .select(col("y"), col("score_r"))
        .withColumn("t", explode(typedlit((0 to 10).map(_ / 10.0))))
        .groupBy("t")
        .agg(
          sum(when(col("score_r") >= col("t") && col("y") > 0.5, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("score_r") >= col("t") && col("y") <= 0.5, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("y") > 0.5, 1L).otherwise(0L)).as("p"),
          sum(when(col("y") <= 0.5, 1L).otherwise(0L)).as("n"))
        .select(round(col("t"), 6).as("t_r"), col("tp"), col("fp"),
          when(col("p") > 0, round(col("tp").cast("double") /
            col("p").cast("double"), 6)).otherwise(lit(-1.0))
            .as("tpr_r"),
          when(col("n") > 0, round(col("fp").cast("double") /
            col("n").cast("double"), 6)).otherwise(lit(-1.0))
            .as("fpr_r"))
        .orderBy("t_r")
    }),

    // Slice-based model evaluation: per-language precision/recall of
    // the trained quality model against the rule labels — the
    // fairness-style check that a single global accuracy can hide a
    // slice the model fails on. Counts are integers, the ratios are
    // exact-integer divisions, and empty denominators surface as the
    // -1 sentinel instead of an ANSI divide-by-zero.
    "q_slice_eval" -> ((s, dir) => {
      val d = docs(s, dir)
      val feats = graft.ops.QualityModel.featurize(d, "doc_id", "text")
      val w = graft.ops.QualityModel.trainLogReg(feats, iters = 5, lr = 0.5)
      graft.ops.QualityModel.scoreLogReg(feats, w)
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") && col("y") > 0.5, 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("pred") && col("y") <= 0.5, 1L).otherwise(0L))
            .as("fp"),
          sum(when(!col("pred") && col("y") > 0.5, 1L).otherwise(0L))
            .as("fn"))
        .select(col("lang"), col("n"), col("tp"), col("fp"), col("fn"),
          round(when(col("tp") + col("fp") === 0, -1.0)
            .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))),
            6).as("prec_r"),
          round(when(col("tp") + col("fn") === 0, -1.0)
            .otherwise(col("tp").cast("double") / (col("tp") + col("fn"))),
            6).as("rec_r"))
        .orderBy("lang")
    }),

    // Reliability diagram for the trained quality model: predictions
    // binned into ten fixed-width confidence bins, each reporting mean
    // predicted confidence vs observed positive rate and their gap —
    // the per-bin decomposition of expected calibration error, the
    // check run before trusting classifier scores as keep
    // probabilities. Bin means stay exact until one division each
    // (confidences sum in DECIMAL(9,6) — the round-6 scores are exact
    // there; positives are integer counts); the gap subtracts two
    // already-rounded values. One keyed aggregate over the scored
    // frame; bins are bounded by the literal 10.
    "q_calibration" -> ((s, dir) => {
      val feats = graft.ops.QualityModel.featurize(
        docs(s, dir), "doc_id", "text")
      val w = graft.ops.QualityModel.trainLogReg(feats, iters = 5, lr = 0.5)
      graft.ops.QualityModel.scoreLogReg(feats, w)
        .withColumn("bin",
          least(floor(col("score_r") * 10), lit(9L)).cast("int"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          sum(col("score_r").cast("decimal(9,6)")).as("ssum"),
          sum(when(col("y") > 0.5, 1L).otherwise(0L)).as("npos"))
        .select(col("bin"), col("n"),
          round(col("ssum").cast("double") / col("n"), 6).as("conf_r"),
          round(col("npos").cast("double") / col("n"), 6).as("obs_r"))
        .withColumn("gap_r", round(abs(col("conf_r") - col("obs_r")), 6))
        .orderBy("bin")
    }),

    // Epoch-weighted repetition plan: en seen 2.5x, zh 1x, the rest
    // 0.5x — one row per (doc, copy), integer arithmetic end to end
    // with the fractional epoch resolved by the deterministic md5
    // bucket (Corpus.repeatPlan), so the recipe is retry-stable and
    // bit-reproducible.
    "q_repeat_plan" -> ((s, dir) =>
      Corpus.repeatPlan(docs(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        weightsX100 = Map("en" -> 250, "zh" -> 100), defaultX100 = 50)
        .orderBy("doc_id", "copy_idx")),

    // Source-adaptive filtering: each source keeps only docs at or
    // above its OWN median length — the group-relative threshold that
    // keeps a verbose source from drowning out a terse one under a
    // single global cutoff. Exact interpolated medians (q_quantiles
    // parity), rounded before the keep compare (the fence rule);
    // report = per-source survivor counts.
    "q_source_adaptive" -> ((s, dir) => {
      val d = docs(s, dir).select(col("source"),
        coalesce(size(split(trim(col("text")), " ")).cast("long"), lit(0L))
          .as("n_tokens"))
        .transform(graft.ops.QueryCaches.persist) // thresholds + keep share it
      val th = d.groupBy("source").agg(
        round(percentile(col("n_tokens"), lit(0.5)), 6).as("p50_r"),
        count(lit(1)).cast("long").as("n_docs"))
      d.join(th, "source")
        .groupBy("source", "n_docs", "p50_r")
        .agg(sum(when(col("n_tokens").cast("double") >= col("p50_r"), 1L)
          .otherwise(0L)).cast("long").as("n_kept"))
        .withColumn("kept_frac_r",
          round(col("n_kept").cast("double") / col("n_docs").cast("double"),
            6))
        .select("source", "n_docs", "p50_r", "n_kept", "kept_frac_r")
        .orderBy("source")
    }),

    // Labeler-agreement audit: Cohen's kappa between the heuristic
    // rule label and the trained model's prediction — the
    // chance-corrected agreement a pipeline reports before swapping a
    // hand rule for a learned filter. All inputs are exact counts, so
    // only the final divisions are float (identical association in
    // the oracle).
    "q_label_agreement" -> ((s, dir) => {
      val feats = graft.ops.QualityModel.featurize(
        docs(s, dir), "doc_id", "text")
      val w = graft.ops.QualityModel.trainLogReg(feats, iters = 5, lr = 0.5)
      val sc = graft.ops.QualityModel.scoreLogReg(feats, w)
        .select((col("y") > 0.5).as("rule"), col("pred"))
      val counts = sc.agg(
        count(lit(1)).cast("long").as("n"),
        sum(when(col("rule") && col("pred"), 1L).otherwise(0L)).as("n11"),
        sum(when(!col("rule") && !col("pred"), 1L).otherwise(0L)).as("n00"),
        sum(when(col("rule") && !col("pred"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("rule") && col("pred"), 1L).otherwise(0L)).as("n01"))
      val nD = col("n").cast("double")
      val po = (col("n11") + col("n00")).cast("double") / nD
      val pe = ((col("n11") + col("n10")).cast("double") / nD) *
        ((col("n11") + col("n01")).cast("double") / nD) +
        ((col("n00") + col("n01")).cast("double") / nD) *
          ((col("n00") + col("n10")).cast("double") / nD)
      counts.select(col("n"), col("n11"), col("n00"), col("n10"),
        col("n01"), round(po, 6).as("po_r"),
        // + 0.0: po ≈ pe (agreement at chance level) lands kappa AT
        // zero — the computed-zero sign-split rule, both sides
        (round(when(lit(1.0) - pe === 0.0, 0.0)
          .otherwise((po - pe) / (lit(1.0) - pe)), 6) + lit(0.0))
          .as("kappa_r"))
    }),

    // GPT-style sequence packing: the corpus concatenated in doc_id
    // order and chopped into 128-token training sequences; one row
    // per (sequence, document) span with exact-integer offsets, so
    // the gate is bit-deterministic (Corpus.packSequences — global
    // prefix sum + stateless explode, no single-partition window).
    "q_pack_sequences" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
      Corpus.packSequences(base, "doc_id", "n_tokens", window = 128)
        .orderBy("seq_id", "doc_id")
    }),

    // T5-style span-corruption plan (Corpus.spanCorruptionPlan): one
    // masked 3-token span per full 20-token block at an md5-derived
    // offset — 15% noise density, non-overlapping by construction,
    // RNG-free so a retry replays the identical mask. Stateless
    // per-doc explode, exact integers end to end.
    "q_span_corrupt" -> ((s, dir) =>
      Corpus.spanCorruptionPlan(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id", "span_idx")),

    // Training-shard manifest — the reproducibility audit shipped
    // with every packed corpus: per shard, the doc count, token
    // total, and an order-stable content fingerprint (md5 over the
    // doc fingerprints in doc_id order). Two jobs can prove they
    // trained on byte-identical shards by comparing manifests alone.
    "q_shard_manifest" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tokens"),
        md5(graft.ops.TextDedup.normText(col("text"))).as("fp"))
      ScaleOps.globalRunningSum(base, partitions = 8,
        valueCol = "n_tokens", outCol = "cum_tokens", col("doc_id"))
        .withColumn("shard_id", expr("(cum_tokens - n_tokens) div 500"))
        .groupBy("shard_id")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("shard_tokens"),
          md5(array_join(transform(array_sort(collect_list(
            struct(col("doc_id"), col("fp")))),
            x => x.getField("fp")), "")).as("shard_fp"))
        .orderBy("shard_id")
    }),

    // Exact-N stratified sample: exactly 10 docs per source, ranked
    // by salted md5 of the id — the eval-set construction shape
    // (q_sample_hash's rate-based cousin only lands NEAR a quota).
    "q_sample_exact" -> ((s, dir) =>
      Corpus.sampleExactPerStratum(
        docs(s, dir).select("doc_id", "source"),
        strataCol = "source", idCol = "doc_id", n = 10)
        .select("doc_id", "source", "sample_rank")
        .orderBy("source", "sample_rank")),

    // Benchmark decontamination: docs whose id ends in 0 stand in for
    // the eval set; flag every other (training) doc sharing a word
    // 5-gram with it, with the shared-5-gram count. 5-grams keep the
    // gate selective over this small-vocabulary synthetic corpus the
    // way 8-13-grams do over real text — only the planted dup
    // families trip it, not chance collisions.
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.decontaminate(
        train = d.filter(col("doc_id") % 10 =!= 0),
        benchmark = d.filter(col("doc_id") % 10 === 0),
        idCol = "doc_id", textCol = "text", n = 5)
        .orderBy("doc_id")
    }),

    // Contamination severity: per flagged doc, the fraction of its
    // distinct 5-grams that leak from the benchmark — "drop or just
    // redact". Sizes are computed for the flagged slice only (the
    // full train side never exchanges its exploded shingles).
    "q_decontam_overlap" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.contaminationReport(
        train = d.filter(col("doc_id") % 10 =!= 0),
        benchmark = d.filter(col("doc_id") % 10 === 0),
        idCol = "doc_id", textCol = "text", n = 5)
        .orderBy("doc_id")
    }),

    // Deterministic train/val/test assignment: 80/10/10 on the md5
    // bucket (salt-isolated from q_sample_hash). Pure projection —
    // no shuffle; a document's split never changes as the corpus
    // grows, unlike any rand()/orderBy-based splitter.
    "q_split_assign" -> ((s, dir) =>
      Corpus.assignSplit(docs(s, dir), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select(col("doc_id"), col("lang"), col("bucket"), col("split"))
        .orderBy("doc_id")),

    // PII redaction: scrub emails / phone numbers / IPv4s and count
    // what was removed. The synthetic corpus carries no PII, so a
    // deterministic PII-bearing suffix is derived from doc_id (the
    // q_xlsx fixture precedent: derived from the input table, not
    // synthesized data) — every doc gets an email, every 3rd a phone,
    // every 5th an IP, making the redaction counts non-trivial.
    "q_pii_redact" -> ((s, dir) => {
      val idStr = col("doc_id").cast("string")
      val aug = concat(col("text"),
        lit(" contact user"), idStr, lit("@example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" tel +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" ssn "),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" iban GB"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0"),
            lit("GRAFT0"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("aug")
      // counts are STAGED — each rule counts on the text the previous
      // rules already redacted, so a span two patterns both match
      // (e.g. an IP-shaped email local part) is counted once, by the
      // rule that actually removed it; chaining single-rule redactPii
      // calls is definitionally the composed fold
      val rules = Corpus.defaultPiiRules
      docs(s, dir).select(col("doc_id"), aug)
        .withColumn("n_email", regexp_count(col("aug"), lit(rules(0)._1)))
        .withColumn("s1", Corpus.redactPii(col("aug"), rules.slice(0, 1)))
        .withColumn("n_phone", regexp_count(col("s1"), lit(rules(1)._1)))
        .withColumn("s2", Corpus.redactPii(col("s1"), rules.slice(1, 2)))
        .withColumn("n_ip", regexp_count(col("s2"), lit(rules(2)._1)))
        .withColumn("s3", Corpus.redactPii(col("s2"), rules.slice(2, 3)))
        .withColumn("n_ssn", regexp_count(col("s3"), lit(rules(3)._1)))
        .withColumn("s4", Corpus.redactPii(col("s3"), rules.slice(3, 4)))
        .withColumn("n_iban", regexp_count(col("s4"), lit(rules(4)._1)))
        .select(col("doc_id"),
          Corpus.redactPii(col("s4"), rules.slice(4, 5)).as("clean"),
          col("n_email"), col("n_phone"), col("n_ip"),
          col("n_ssn"), col("n_iban"))
        .orderBy("doc_id")
    }),

    // Temperature-scaled domain mixture (p ∝ tokens^0.5 per source):
    // the sampling-weight table a multi-source training run feeds its
    // data loader. One keyed aggregate + a 1-row broadcast total.
    "q_domain_mix" -> ((s, dir) =>
      Corpus.domainMixture(docs(s, dir), "source",
        size(graft.ops.TextDedup.tokens(col("text"))))
        .orderBy("source")),

    // RAG/context-window chunking: 64-token chunks overlapping by 16.
    // Pure scan + explode — per-row arithmetic, no shuffle.
    "q_chunk_tokens" -> ((s, dir) =>
      Corpus.chunkTokens(docs(s, dir), "doc_id", "text",
        size = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx")),

    // The composed END-TO-END curation pipeline — what a user actually
    // ships: quality gates → exact dedup (keep-min id) → benchmark
    // decontamination (docs ending in 0 stand in for the eval set) →
    // deterministic 80/10/10 split → the train slice packed into
    // 500-token shards. Every stage is one of the individually
    // oracle-checked ops; this query pins that they compose.
    "q_pipeline_e2e" -> ((s, dir) => {
      val d = docs(s, dir)
      val kept = Corpus.curate(
        d.select("doc_id", "lang", "source", "text"),
        "doc_id", "text", stopWords)
      // recover text for the n-gram decontamination stage (curate
      // drops the payload), then drop eval-leaking docs
      val keptText = kept.select("doc_id", "n_tokens")
        .join(d.select(col("doc_id"), col("text")), Seq("doc_id"))
      val clean = Corpus.decontaminatedKeep(
        train = keptText.filter(col("doc_id") % 10 =!= 0),
        benchmark = d.filter(col("doc_id") % 10 === 0),
        idCol = "doc_id", textCol = "text", n = 5)
      val train = Corpus.assignSplit(clean.drop("text"), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .filter(col("split") === "train")
      ScaleOps.globalRunningSum(
        train.select(col("doc_id"), col("n_tokens").cast("long")),
        partitions = 8, valueCol = "n_tokens", outCol = "cum_tokens",
        col("doc_id"))
        .withColumn("shard_id", expr("(cum_tokens - n_tokens) div 500"))
        .select("doc_id", "n_tokens", "cum_tokens", "shard_id")
        .orderBy("doc_id")
    }),

    // Incremental LM scoring — the nightly shape: the standing
    // corpus's unigram vocabulary (docs < 250 stand in for the
    // corpus) scores tonight's batch (the rest) without
    // re-aggregating the corpus; never-seen tokens count as OOV and
    // are excluded from the mean (no smoothing keeps the oracle
    // exact). Production keeps the vocabulary tok-bucketed on disk
    // (Corpus.writeVocabulary) so the scoring join never exchanges
    // the vocabulary side.
    "q_unigram_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      val vocab = d.filter(col("doc_id") < 250)
        .select(explode(graft.ops.TextDedup.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      Corpus.unigramLogProbAgainst(
        d.filter(col("doc_id") >= 250), "doc_id", "text", vocab)
        .orderBy("doc_id")
    }),

    // Mixture-driven sampling: the domain-mixture weights actually
    // drive the deterministic sampler — per-source keep rate =
    // floor(weight·400) percent (floor, not round: round's half mode
    // differs across engines), md5 bucket salt-isolated from the
    // other samplers. The composed shape a multi-source loader runs.
    "q_mix_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      val mix = Corpus.domainMixture(d, "source",
        size(graft.ops.TextDedup.tokens(col("text"))))
        .select(col("source"),
          floor(col("weight") * 400).cast("long").as("rate_pct"))
      d.select(col("doc_id"), col("source"))
        .withColumn("bucket", Corpus.hashBucket(col("doc_id"), "mix"))
        .join(broadcast(mix), "source")
        .filter(col("bucket") < col("rate_pct"))
        .select(col("doc_id"), col("source"), col("bucket"),
          col("rate_pct"))
        .orderBy("doc_id")
    }),

    // Corpus drift monitor: the 'en' slice as the reference
    // distribution, everything else as the new arrivals; the 25
    // largest positive KL(new‖ref) contributors are the tokens whose
    // over-representation defines the shift. Ties at the rounded
    // contribution break on token text — total order both engines.
    "q_corpus_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.tokenDrift(
        ref = d.filter(col("lang") === "en"),
        nw = d.filter(col("lang") =!= "en"))
        .orderBy(col("kl_contrib").desc, col("tok"))
        .limit(25)
    }),

    // Snapshot upsert: the standing corpus is revision 1; a re-crawl
    // delivers revision 2 for every third document; keep-latest wins
    // per doc_id (Corpus.upsertLatest — one keyed window, no join).
    // Output fingerprints prove the WINNING text survived, not just
    // the winning version number.
    "q_upsert" -> ((s, dir) => {
      val d = docs(s, dir)
      val v1 = d.select(col("doc_id"), col("text"), lit(1L).as("version"))
      val v2 = d.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" [rev2]")).as("text"),
          lit(2L).as("version"))
      Corpus.upsertLatest(v1.unionByName(v2), "doc_id", "version")
        .select(col("doc_id"), col("version"), md5(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // Compression-ratio quality signal (Corpus.compressionRatio):
    // deflate_len / utf8_len per document. Rows-only BY DESIGN — no
    // SQL engine exposes deflate — with CorpusSpec pinning exact
    // lengths against java.util.zip run independently, plus the
    // repetitive ≪ random ordering (the q_sniff pattern).
    "q_compress_ratio" -> ((s, dir) =>
      Corpus.compressionRatio(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Dataset card: the per-source release summary a training run
    // reads first — doc/token totals, quality-gate pass count, and
    // docs sharing a fingerprint with ANY doc corpus-wide (the dup
    // exposure). One scan builds the per-doc facts, the corpus-wide
    // fingerprint counts come back through a fp-keyed join (NO
    // broadcast hint — fingerprint cardinality is corpus-sized), then
    // one aggregate per source. All-integer compare.
    "q_dataset_card" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        md5(graft.ops.TextDedup.normText(col("text"))).as("fp"),
        size(graft.ops.TextDedup.tokens(col("text"))).cast("long")
          .as("n_toks"),
        Corpus.qualityPass(col("text")).as("q"))
        .transform(graft.ops.QueryCaches.persist) // facts + fp counts
      val fpCounts = d.groupBy("fp").agg(count(lit(1)).as("n_fp"))
      d.join(fpCounts, "fp")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          sum(when(col("q"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("n_fp") > 1, 1L).otherwise(0L)).as("n_dup"))
        .orderBy("source")
    }),

    // Copy-on-write partition merge (ScaleOps.copyOnWriteMerge): the
    // corpus lands partitioned by lang; a corrections batch revises
    // only the 'de' docs, so ONLY lang=de is rewritten (staging +
    // directory swap — untouched partitions physically untouched,
    // spec-pinned). The gate reads the merged layout back cold and
    // must equal the full SQL merge.
    "q_cow_merge" -> ((s, dir) => {
      val base = Tables.scratchDir(s, "graft_cow_docs").toString
      val d = docs(s, dir)
        .select(col("doc_id"), col("lang"), col("text"),
          lit(1L).as("version"))
      ScaleOps.writePartitioned(d, base, "lang")
      val updates = docs(s, dir).filter(col("lang") === "de")
        .select(col("doc_id"), col("lang"),
          concat(col("text"), lit(" [rev2]")).as("text"),
          lit(2L).as("version"))
      ScaleOps.copyOnWriteMerge(s, base, updates,
        partCol = "lang", idCol = "doc_id", versionCol = "version")
      s.read.parquet(base)
        .select(col("doc_id"), col("lang"), col("version"),
          md5(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // k-anonymity audit on the (lang, source) quasi-identifier pair:
    // groups under k=15 are re-identifiable combinations flagged for
    // suppression before release (Corpus.kAnonymityReport — one keyed
    // count, the privacy companion to q_pii_redact).
    "q_k_anon" -> ((s, dir) =>
      Corpus.kAnonymityReport(docs(s, dir), Seq("lang", "source"), k = 15)
        .orderBy("lang", "source")),

    // t-closeness audit on (lang, source): the third of the privacy
    // triad — a group breaches when the Earth-Mover's Distance between
    // its sensitive-value distribution (n_chars, 200-char ordered
    // buckets) and the global distribution exceeds t. For an ordered
    // domain EMD = Σ|cum_p − cum_q| / (m−1); both cumulative counts
    // stay INTEGER until one exact division each (identical doubles on
    // both engines), the per-group window is keyed (scalable), and the
    // group×bucket scaffold crosses two bounded aggregates — groups ×
    // buckets never grows with the corpus.
    "q_t_closeness" -> ((s, dir) => {
      val d = docs(s, dir).select(col("lang"), col("source"),
        expr("n_chars div 200").as("sb"))
        .transform(graft.ops.QueryCaches.persist) // group, global + total aggs share it
      val gb = d.groupBy("lang", "source", "sb")
        .agg(count(lit(1)).as("n"))
        .transform(graft.ops.QueryCaches.persist) // group totals + scaffold join
      val groups = gb.groupBy("lang", "source").agg(sum(col("n")).as("n_rows"))
      val glob = d.groupBy("sb").agg(count(lit(1)).as("gn"))
        .transform(graft.ops.QueryCaches.persist) // scaffold + bucket count
      // eager: broadcast(tot)/broadcast(nb) subtrees read the d/glob/gb
      // caches — materialize before the races (CLAUDE.md); glob's count
      // fills d's cache as a side effect, gb's reads it
      glob.count(); gb.count()
      val tot = d.agg(count(lit(1)).as("nt"))
      val nb = glob.agg(count(lit(1)).as("m"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "source").orderBy("sb")
      groups.crossJoin(glob.select(col("sb"), col("gn")))
        .join(gb, Seq("lang", "source", "sb"), "left")
        .na.fill(0L, Seq("n"))
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cg", sum(col("gn")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("ad", abs(col("cn").cast("double") / col("n_rows") -
          col("cg").cast("double") / col("nt")))
        .groupBy("lang", "source", "n_rows")
        .agg(sum(col("ad")).as("emd"))
        .crossJoin(broadcast(nb))
        .select(col("lang"), col("source"), col("n_rows"),
          // greatest(m−1, 1): a single-bucket corpus (every doc in one
          // 200-char band) made this 0/0 — Spark NaN vs DuckDB NULL.
          // With m=1 every ad is 0, so emd/1 = 0 on both engines.
          round(col("emd") / greatest(col("m") - 1, lit(1L)), 6)
            .as("emd_r"))
        .withColumn("breach", col("emd_r") > 0.15)
        .orderBy("lang", "source")
    }),

    // l-diversity audit on (event_type, day): a group is flagged when
    // its DISTINCT sensitive values (user ids) fall under l — the
    // k-anonymity follow-up that catches large-but-homogeneous groups.
    "q_l_diversity" -> ((s, dir) =>
      Corpus.lDiversityReport(
        graft.Tables.events(s, dir).select(col("event_type"),
          date_trunc("day", col("ts_sec")).as("day"), col("user_id")),
        Seq("event_type", "day"), "user_id", l = 55)
        .orderBy("event_type", "day")),

    // Change-data-feed summary between two corpus snapshots: the new
    // snapshot simulates a re-crawl (every 'de' doc revised, doc_id%10
    // == 7 dropped, 50 fresh ids appended); one full-outer fingerprint
    // join classifies ids, then per-source counts.
    "q_snapshot_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      // both snaps feed the diff AND the source map (md5 over every
      // text would run twice), and the srcMap join side is small
      // enough for AQE to broadcast — persist + eager-materialize so
      // the broadcast job reads caches (CLAUDE.md lazy-cache race)
      val oldSnap = d.select(col("doc_id"), col("source"),
        md5(col("text")).as("fp"))
        .transform(graft.ops.QueryCaches.persist)
      val newSnap = d.filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"), col("source"),
          when(col("lang") === "de",
            md5(concat(col("text"), lit(" [rev2]"))))
            .otherwise(md5(col("text"))).as("fp"))
        .unionByName(d.filter(col("doc_id") < 50)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
            md5(concat(lit("new:"), col("text"))).as("fp")))
        .transform(graft.ops.QueryCaches.persist)
      oldSnap.count(); newSnap.count()
      val status = Corpus.snapshotDiff(
        oldSnap.select("doc_id", "fp"), newSnap.select("doc_id", "fp"),
        "doc_id", "fp")
      val srcMap = oldSnap.select(col("doc_id"), col("source"))
        .unionByName(newSnap.select(col("doc_id"), col("source")))
        .distinct()
      status.join(srcMap, "doc_id")
        .groupBy("source", "status").agg(count(lit(1)).as("n"))
        .orderBy("source", "status")
    }),

    // Deterministic weighted sampling without replacement (A-ES
    // exponential keys): per language, the 5 docs with the smallest
    // round(−ln(u)/w, 6) where u is an md5 uniform and w = n_chars —
    // longer docs proportionally likelier, yet fully reproducible
    // under retry (no rand()) and cross-engine (the rounded key is
    // ranked with a doc_id tiebreak, so an ln ulp cannot flip
    // membership). The curation shape for upweighting quality sources.
    "q_weighted_sample" -> ((s, dir) => {
      val u = (conv(substring(
        md5(concat(lit("ws:"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long") + lit(1L)).cast("double") /
        lit(4294967296.0)
      val keyed = docs(s, dir).filter(col("n_chars") > 0)
        .select(col("lang"), col("doc_id"), col("n_chars"),
          // + 0.0: an ffffffff md5 prefix makes u = 1.0 exactly →
          // −ln(1) = −0.0 → k_r = −0.0; normalize on both sides
          (round((-log(u)) / col("n_chars").cast("double"), 6) + lit(0.0))
            .as("k_r"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("k_r"), col("doc_id"))
      keyed.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .orderBy("lang", "rank")
    }),

    // Chi-square independence cells for lang × source: observed vs
    // expected counts and per-cell contribution — the corpus-balance
    // diagnostic (is language mix independent of source?). All doubles
    // derive from exact integer counts in expressions mirrored
    // verbatim by the oracle.
    "q_chi_square" -> ((s, dir) => {
      val o = docs(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("o"))
        .transform(graft.ops.QueryCaches.persist) // 3 margins + join side
      o.count() // eager: broadcast(n) + margin joins race a lazy cache
      val rt = o.groupBy("lang").agg(sum(col("o")).as("rt"))
      val ct = o.groupBy("source").agg(sum(col("o")).as("ct"))
      val n = o.agg(sum(col("o")).as("n"))
      o.join(rt, "lang").join(ct, "source").crossJoin(broadcast(n))
        .withColumn("e", col("rt").cast("double") *
          col("ct").cast("double") / col("n").cast("double"))
        .select(col("lang"), col("source"), col("o"),
          round(col("e"), 6).as("e_r"),
          round((col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e"), 6)
            .as("contrib_r"))
        .orderBy("lang", "source")
    }),

    // Length-based curriculum schedule: the classic easy-to-hard
    // training order — documents ranked by token count into ten equal
    // phases (exact integer arithmetic: phase = (rank−1)·10 div N, no
    // ntile and no single-partition window — rank comes from the
    // two-phase ScaleOps.globalRowNumber), then shuffled WITHIN each
    // phase by the deterministic md5 order (retry-stable, seedless).
    // The within-phase order is a SECOND two-phase global rank over
    // (phase, md5, id) minus each phase's min rank: a window
    // partitioned by the 10-value phase key would sort n/10 of the
    // corpus in one reducer — a near-global funnel the unpartitioned-
    // window tripwire can't see (the key cardinality is a literal 10,
    // independent of corpus size).
    "q_curriculum" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(graft.ops.TextDedup.tokens(col("text"))).as("n_tokens"))
      val ranked = graft.ops.ScaleOps.globalRowNumber(d, 8,
        col("n_tokens"), col("doc_id"))
      val tot = ranked.agg(count(lit(1)).as("n_total"))
      val phased = ranked.crossJoin(broadcast(tot))
        .withColumn("phase",
          expr("((rn - 1) * 10) div n_total").cast("int"))
        .select(col("doc_id"), col("n_tokens"), col("phase"))
      val ranked2 = graft.ops.ScaleOps.globalRowNumber(phased, 8,
        col("phase"), md5(col("doc_id").cast("string")), col("doc_id"))
      // per-phase min rank → 1-based within-phase ord; ≤10 rows, a
      // bounded-by-construction lookup (AQE broadcasts it)
      val base = ranked2.groupBy("phase").agg(min(col("rn")).as("pbase"))
      ranked2.join(base, "phase")
        .withColumn("ord", (col("rn") - col("pbase") + 1L).cast("long"))
        .select(col("doc_id"), col("n_tokens"), col("phase"), col("ord"))
        .orderBy("phase", "ord")
    }),

    // DPO/RLHF preference-pair mining: per source, pair the 3
    // highest-quality documents (chosen) with the 3 lowest (rejected)
    // — the offline construction a preference-tuning pipeline feeds
    // on when it has a scalar quality signal but no human labels.
    // The signal is the repo's canonical stopword-ratio axis (an
    // exact integer quotient both engines compute bit-identically),
    // where HIGH ratio = boilerplate = LOW quality (the
    // Corpus.qualityPass convention: the gate fails ratio > max) —
    // so chosen = the LOWEST-ratio docs, rejected = the highest, and
    // gap_r = rejected_ratio − chosen_ratio ≥ 0. Sources with < 6
    // docs are skipped (the top-3/bottom-3 sets would overlap and a
    // doc would prefer itself). Ranking within the ~20-value source
    // domain is the fixed-domain-key funnel case (CLAUDE.md): one
    // two-phase global rank over (source, ratio, doc_id) minus each
    // source's min rank — no per-source window reducer ever sees
    // corpus/|domain| rows. The 3×3 pair join fans out ≤ 9 rows per
    // source, bounded by the literal k.
    "q_pref_pairs" -> ((s, dir) => {
      val tk = graft.ops.TextDedup.tokens(col("text"))
      val sc = docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(filter(tk, x =>
            x.isInCollection(graft.ops.Corpus.defaultStopWords)))
            .as("n_stop"),
          size(tk).as("n_tok"))
        .filter(col("n_tok") >= 1) // guard the ratio at its projection
        .withColumn("r",
          col("n_stop").cast("double") / col("n_tok").cast("double"))
        .select(col("doc_id"), col("source"), col("r"))
      val ranked = graft.ops.ScaleOps.globalRowNumber(sc, 8,
        col("source"), col("r"), col("doc_id"))
      // ≤ |sources| rows — bounded by construction (AQE broadcasts)
      val base = ranked.groupBy("source")
        .agg(min(col("rn")).as("pbase"), count(lit(1)).as("cnt"))
      val w = ranked.join(base, "source")
        .withColumn("ord", (col("rn") - col("pbase") + 1L).cast("long"))
        .filter(col("cnt") >= 6)
        .transform(graft.ops.QueryCaches.persist) // chosen + rejected arms
      // rank is ratio-ASCENDING: ord ≤ 3 = lowest stopword ratio =
      // highest quality (chosen); the top of the order is rejected
      val chosen = w.filter(col("ord") <= 3)
        .select(col("source"), col("doc_id").as("chosen_id"),
          col("r").as("cr"))
      val rejected = w.filter(col("ord") > col("cnt") - 3)
        .select(col("source"), col("doc_id").as("rejected_id"),
          col("r").as("rr"))
      chosen.join(rejected, "source")
        .select(col("source"), col("chosen_id"), col("rejected_id"),
          round(col("rr") - col("cr"), 6).as("gap_r"))
        .orderBy("source", "chosen_id", "rejected_id")
    }))

  /** Unrolled-GD oracle chain for the q_logreg_* gates: the feature
    * CTE plus one (sigmoid, gradient, weight-update) CTE triple per
    * round, written with the EXACT arithmetic the Spark side runs —
    * same association in z, same DECIMAL(28,14) gradient sums, same
    * g/n-then-times-lr update — so the two engines' weight vectors
    * agree to well under the round(…,6) gate.
    */
  private def logregChainSql(iters: Int, lr: String): String = {
    val feat =
      """WITH f AS MATERIALIZED (SELECT doc_id,
           CASE WHEN length(text) BETWEEN 20 AND 2000
               AND len(string_split(trim(text), ' ')) >= 5
               AND CAST(len(list_filter(string_split(trim(text), ' '),
                   x -> list_contains(['the','a','data','row','key'], x)))
                 AS DOUBLE)
                 / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) <= 0.5
             THEN 1.0 ELSE 0.0 END AS y,
           1.0 AS x0,
           CAST(len(string_split(trim(text), ' ')) AS DOUBLE) / 100.0 AS x1,
           CAST(len(list_filter(string_split(trim(text), ' '),
               x -> list_contains(['the','a','data','row','key'], x)))
             AS DOUBLE)
             / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS x2,
           CAST(length(text) AS DOUBLE) / 1000.0 AS x3
         FROM documents WHERE text IS NOT NULL),
         nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
         w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    val rounds = (1 to iters).map { k =>
      val p = s"w${k - 1}"
      s"""s$k AS (SELECT f.*, 1.0 / (1.0 + exp(-(((w.w0 * x0 + w.w1 * x1)
             + w.w2 * x2) + w.w3 * x3))) AS sig
           FROM f CROSS JOIN $p w),
         g$k AS MATERIALIZED (SELECT
             CAST(sum(CAST((sig - y) * x0 AS DECIMAL(28,14))) AS DOUBLE) AS g0,
             CAST(sum(CAST((sig - y) * x1 AS DECIMAL(28,14))) AS DOUBLE) AS g1,
             CAST(sum(CAST((sig - y) * x2 AS DECIMAL(28,14))) AS DOUBLE) AS g2,
             CAST(sum(CAST((sig - y) * x3 AS DECIMAL(28,14))) AS DOUBLE) AS g3
           FROM s$k),
         w$k AS MATERIALIZED (SELECT
             w.w0 - $lr * (g.g0 / nn.n) AS w0,
             w.w1 - $lr * (g.g1 / nn.n) AS w1,
             w.w2 - $lr * (g.g2 / nn.n) AS w2,
             w.w3 - $lr * (g.g3 / nn.n) AS w3
           FROM $p w CROSS JOIN g$k g CROSS JOIN nn)"""
    }.mkString(",\n         ")
    s"$feat,\n         $rounds"
  }

  private def logregTrainOracle(iters: Int, lr: String): String =
    s"""${logregChainSql(iters, lr)},
         z AS (SELECT f.y, (((w.w0 * x0 + w.w1 * x1) + w.w2 * x2)
             + w.w3 * x3) AS z
           FROM f CROSS JOIN w$iters w),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             round(avg(CASE WHEN (round(z, 6) > 0) = (y > 0.5)
               THEN 1.0 ELSE 0.0 END), 6) AS acc_r
           FROM z)
         SELECT a.n, round(w.w0, 6) AS w0_r, round(w.w1, 6) AS w1_r,
           round(w.w2, 6) AS w2_r, round(w.w3, 6) AS w3_r, a.acc_r
         FROM w$iters w CROSS JOIN a"""

  private def logregScoreOracle(iters: Int, lr: String): String =
    s"""${logregChainSql(iters, lr)},
         z AS (SELECT f.doc_id, f.y, (((w.w0 * x0 + w.w1 * x1)
             + w.w2 * x2) + w.w3 * x3) AS z
           FROM f CROSS JOIN w$iters w)
         SELECT doc_id, y, round(1.0 / (1.0 + exp(-z)), 6) AS score_r,
           round(z, 6) > 0 AS pred
         FROM z ORDER BY doc_id"""

  private def rocOracle(iters: Int, lr: String): String =
    s"""${logregChainSql(iters, lr)},
         z AS (SELECT f.doc_id, f.y, (((w.w0 * x0 + w.w1 * x1)
             + w.w2 * x2) + w.w3 * x3) AS z
           FROM f CROSS JOIN w$iters w),
         sc AS (SELECT y, round(1.0 / (1.0 + exp(-z)), 6) AS score_r
           FROM z),
         tt AS (SELECT CAST(unnest([0.0, 0.1, 0.2, 0.3, 0.4, 0.5,
             0.6, 0.7, 0.8, 0.9, 1.0]) AS DOUBLE) AS t),
         g AS (SELECT t,
             CAST(sum(CASE WHEN score_r >= t AND y > 0.5
               THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN score_r >= t AND y <= 0.5
               THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS p,
             CAST(sum(CASE WHEN y <= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n
           FROM sc CROSS JOIN tt GROUP BY t)
         SELECT round(t, 6) AS t_r, tp, fp,
           CASE WHEN p > 0 THEN round(CAST(tp AS DOUBLE) /
             CAST(p AS DOUBLE), 6) ELSE -1.0 END AS tpr_r,
           CASE WHEN n > 0 THEN round(CAST(fp AS DOUBLE) /
             CAST(n AS DOUBLE), 6) ELSE -1.0 END AS fpr_r
         FROM g ORDER BY t_r"""

  private def uncertaintyOracle(iters: Int, lr: String): String =
    s"""${logregChainSql(iters, lr)},
         z AS (SELECT f.doc_id, (((w.w0 * x0 + w.w1 * x1)
             + w.w2 * x2) + w.w3 * x3) AS z
           FROM f CROSS JOIN w$iters w),
         sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6)
             AS score_r FROM z)
         SELECT doc_id, score_r,
           round(abs(score_r - 0.5), 6) AS unc_r
         FROM sc ORDER BY unc_r, doc_id LIMIT 20"""

  private def calibrationOracle(iters: Int, lr: String): String =
    s"""${logregChainSql(iters, lr)},
         z AS (SELECT f.doc_id, f.y, (((w.w0 * x0 + w.w1 * x1)
             + w.w2 * x2) + w.w3 * x3) AS z
           FROM f CROSS JOIN w$iters w),
         sc AS (SELECT doc_id, y,
             round(1.0 / (1.0 + exp(-z)), 6) AS score_r FROM z),
         b AS (SELECT CAST(least(floor(score_r * 10), 9) AS INTEGER)
               AS bin,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(score_r AS DECIMAL(9,6))) AS ssum,
             CAST(sum(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS npos
           FROM sc GROUP BY 1)
         SELECT bin, n, round(CAST(ssum AS DOUBLE) / n, 6) AS conf_r,
           round(CAST(npos AS DOUBLE) / n, 6) AS obs_r,
           round(abs(round(CAST(ssum AS DOUBLE) / n, 6)
             - round(CAST(npos AS DOUBLE) / n, 6)), 6) AS gap_r
         FROM b ORDER BY bin"""

  private def sliceEvalOracle(iters: Int, lr: String): String =
    s"""${logregChainSql(iters, lr)},
         z AS (SELECT f.doc_id, f.y,
             round((((w.w0 * x0 + w.w1 * x1) + w.w2 * x2) + w.w3 * x3), 6)
               > 0 AS pred
           FROM f CROSS JOIN w$iters w),
         sl AS (SELECT d.lang, z.y, z.pred
           FROM z JOIN documents d ON d.doc_id = z.doc_id),
         m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pred AND y > 0.5 THEN 1 ELSE 0 END)
               AS BIGINT) AS tp,
             CAST(sum(CASE WHEN pred AND y <= 0.5 THEN 1 ELSE 0 END)
               AS BIGINT) AS fp,
             CAST(sum(CASE WHEN NOT pred AND y > 0.5 THEN 1 ELSE 0 END)
               AS BIGINT) AS fn
           FROM sl GROUP BY 1)
         SELECT lang, n, tp, fp, fn,
           round(CASE WHEN tp + fp = 0 THEN -1.0
             ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS prec_r,
           round(CASE WHEN tp + fn = 0 THEN -1.0
             ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS rec_r
         FROM m ORDER BY lang"""

  private def labelAgreementOracle(iters: Int, lr: String): String =
    s"""${logregChainSql(iters, lr)},
         z AS (SELECT (f.y > 0.5) AS rule,
             round((((w.w0 * x0 + w.w1 * x1) + w.w2 * x2) + w.w3 * x3), 6)
               > 0 AS pred
           FROM f CROSS JOIN w$iters w),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN rule AND pred THEN 1 ELSE 0 END)
               AS BIGINT) AS n11,
             CAST(sum(CASE WHEN NOT rule AND NOT pred THEN 1 ELSE 0 END)
               AS BIGINT) AS n00,
             CAST(sum(CASE WHEN rule AND NOT pred THEN 1 ELSE 0 END)
               AS BIGINT) AS n10,
             CAST(sum(CASE WHEN NOT rule AND pred THEN 1 ELSE 0 END)
               AS BIGINT) AS n01
           FROM z)
         SELECT n, n11, n00, n10, n01,
           round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po_r,
           round(CASE WHEN 1.0 -
               ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
                 (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
                (CAST(n00 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) *
                 (CAST(n00 + n10 AS DOUBLE) / CAST(n AS DOUBLE))) = 0.0
             THEN 0.0
             ELSE (CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) -
               ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
                 (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
                (CAST(n00 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) *
                 (CAST(n00 + n10 AS DOUBLE) / CAST(n AS DOUBLE)))) /
               (1.0 -
               ((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE)) *
                 (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) +
                (CAST(n00 + n01 AS DOUBLE) / CAST(n AS DOUBLE)) *
                 (CAST(n00 + n10 AS DOUBLE) / CAST(n AS DOUBLE))))
             END, 6) + 0.0 AS kappa_r
         FROM c"""

  val oracles: Map[String, String] = Map(
    "q_weighted_median" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
         c AS (SELECT source, doc_id, n_chars,
             CAST(sum(n_chars) OVER (PARTITION BY source
               ORDER BY n_chars, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM d),
         t AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_docs
           FROM d GROUP BY 1),
         q AS (SELECT c.source, c.doc_id, c.n_chars, t.total, t.n_docs
           FROM c JOIN t ON t.source = c.source
           WHERE c.cum * 2 >= t.total),
         r AS (SELECT source, n_chars, doc_id, total, n_docs,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS rn
           FROM q)
         SELECT source, n_docs, total AS total_chars,
           n_chars AS wmedian_chars
         FROM r WHERE rn = 1 ORDER BY source""",
    "q_temp_mix" ->
      """WITH g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY 1),
         t AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z,
             CAST(sum(n_docs) AS BIGINT) AS n_total FROM g)
         SELECT lang, n_docs,
           round(sqrt(CAST(n_docs AS DOUBLE)) / z, 6) AS w_r,
           round(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
             AS prop_r,
           round((sqrt(CAST(n_docs AS DOUBLE)) / z) /
             (CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)), 6)
             AS boost_r
         FROM g CROSS JOIN t ORDER BY lang""",
    "q_url_dedup" ->
      """WITH d AS (SELECT doc_id, doc_id % 4 AS vr,
           CAST(doc_id // 4 AS VARCHAR) AS g FROM documents),
         u AS (SELECT doc_id, CASE vr
             WHEN 0 THEN 'https://www.example.com/page/' || g
             WHEN 1 THEN 'HTTP://WWW.EXAMPLE.COM/page/' || g || '/'
             WHEN 2 THEN 'https://www.example.com:443/page/' || g
               || '?utm_source=feed'
             ELSE 'https://www.example.com/page/' || g || '#sec'
           END AS url FROM d),
         c AS (SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(url), '#.*$', ''),
                   '\?utm_[a-z_]+=[a-z]+$', ''),
                 '^http://', 'https://'),
               '^https://([^/]+):443/', 'https://\1/'),
             '/$', '') AS canon_url
           FROM u)
         SELECT canon_url, CAST(count(*) AS BIGINT) AS n_variants,
           min(doc_id) AS keep_id
         FROM c GROUP BY 1 ORDER BY canon_url""",
    "q_mi_features" ->
      """WITH q AS (SELECT source, lang,
           CAST(n_chars // 100 AS VARCHAR) AS lb,
           CAST(len(string_split(trim(text), ' ')) AS INTEGER)
             AS n_tokens,
           CAST(len(list_filter(string_split(trim(text), ' '),
             x -> list_contains(['the','a','data','row','key'], x)))
             AS INTEGER) AS n_stop,
           CAST(length(text) AS INTEGER) AS len_text
         FROM documents),
         lb AS (SELECT source, lang, lb,
           CASE WHEN len_text BETWEEN 20 AND 2000 AND n_tokens >= 5
             AND CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               <= 0.5 THEN 1 ELSE 0 END AS l FROM q),
         f AS (SELECT 'source' AS feat, source AS v, l FROM lb
           UNION ALL SELECT 'lang', lang, l FROM lb
           UNION ALL SELECT 'len_bucket', lb, l FROM lb),
         cvl AS (SELECT feat, v, l, CAST(count(*) AS BIGINT) AS cvl
           FROM f GROUP BY 1, 2, 3),
         cv AS (SELECT feat, v, CAST(sum(cvl) AS BIGINT) AS cv
           FROM cvl GROUP BY 1, 2),
         cl AS (SELECT feat, l, CAST(sum(cvl) AS BIGINT) AS cl
           FROM cvl GROUP BY 1, 2),
         n AS (SELECT feat, CAST(sum(cvl) AS BIGINT) AS n
           FROM cvl GROUP BY 1)
         SELECT cvl.feat, CAST(count(*) AS BIGINT) AS cells,
           round(sum((CAST(cvl.cvl AS DOUBLE) / CAST(n.n AS DOUBLE)) *
             ln((CAST(cvl.cvl AS DOUBLE) * CAST(n.n AS DOUBLE)) /
               (CAST(cv.cv AS DOUBLE) * CAST(cl.cl AS DOUBLE)))), 6) AS mi_r
         FROM cvl
         JOIN cv ON cv.feat = cvl.feat AND cv.v = cvl.v
         JOIN cl ON cl.feat = cvl.feat AND cl.l = cvl.l
         JOIN n ON n.feat = cvl.feat
         GROUP BY 1 ORDER BY cvl.feat""",
    "q_dp_counts" ->
      """WITH g AS (SELECT lang, source, CAST(count(*) AS BIGINT)
             AS n_true FROM documents GROUP BY 1, 2),
         uu AS (SELECT lang, source, n_true,
           (CAST(CAST(('0x' || substr(md5('dp:' || lang || ':' ||
             source), 1, 8)) AS UBIGINT) AS DOUBLE) + 0.5) /
             4294967296.0 AS u FROM g)
         SELECT lang, source, n_true,
           round(CAST(n_true AS DOUBLE) + CASE WHEN u >= 0.5
             THEN -ln(1.0 - 2.0 * (u - 0.5))
             ELSE ln(1.0 - 2.0 * (0.5 - u)) END, 6) + 0.0 AS noisy_r
         FROM uu ORDER BY lang, source""",
    "q_repeat_plan" ->
      """WITH d AS (SELECT doc_id, lang,
           CASE WHEN lang = 'en' THEN 250 WHEN lang = 'zh' THEN 100
             ELSE 50 END AS w,
           CAST(CAST(('0x' || substr(md5('rep:' ||
             CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
             % 100 AS b
         FROM documents),
         n AS (SELECT doc_id, lang,
             CAST((w // 100) + CASE WHEN b < (w % 100) THEN 1 ELSE 0 END
               AS BIGINT) AS n_copies
           FROM d)
         SELECT doc_id, lang,
           CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx
         FROM n WHERE n_copies >= 1 ORDER BY doc_id, copy_idx""",
    "q_source_adaptive" ->
      """WITH d AS (SELECT source,
           COALESCE(CAST(len(string_split(trim(text), ' ')) AS BIGINT), 0)
             AS n_tokens
         FROM documents),
         th AS (SELECT source,
             round(quantile_cont(n_tokens, 0.5), 6) AS p50_r,
             CAST(count(*) AS BIGINT) AS n_docs
           FROM d GROUP BY source),
         k AS (SELECT d.source,
             CAST(sum(CASE WHEN CAST(d.n_tokens AS DOUBLE) >= th.p50_r
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           FROM d JOIN th ON d.source = th.source GROUP BY d.source)
         SELECT th.source, th.n_docs, th.p50_r, k.n_kept,
           round(CAST(k.n_kept AS DOUBLE) / CAST(th.n_docs AS DOUBLE), 6)
             AS kept_frac_r
         FROM th JOIN k ON th.source = k.source ORDER BY th.source""",
    "q_span_corrupt" ->
      """WITH tk AS (SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
         FROM documents),
         b AS (SELECT doc_id, n_tok // 20 AS blocks FROM tk
           WHERE n_tok // 20 >= 1),
         e AS (SELECT doc_id, CAST(unnest(range(0, blocks)) AS BIGINT)
             AS span_idx
           FROM b),
         o AS (SELECT doc_id, span_idx,
             CAST(CAST(('0x' || substr(md5('t5:' ||
               CAST(doc_id AS VARCHAR) || ':' ||
               CAST(span_idx AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
               % 18 AS off
           FROM e)
         SELECT doc_id, span_idx, span_idx * 20 + off AS tok_start,
           CAST(3 AS BIGINT) AS tok_len
         FROM o ORDER BY doc_id, span_idx""",
    "q_label_agreement" -> labelAgreementOracle(5, "0.5"),
    "q_logreg_train" -> logregTrainOracle(5, "0.5"),
    "q_logreg_score" -> logregScoreOracle(5, "0.5"),
    "q_roc_points" -> rocOracle(5, "0.5"),
    "q_uncertainty_sample" -> uncertaintyOracle(5, "0.5"),
    "q_calibration" -> calibrationOracle(5, "0.5"),
    "q_slice_eval" -> sliceEvalOracle(5, "0.5"),
    "q_sample_hash" ->
      """WITH s AS (SELECT doc_id, lang,
           CAST(CAST(('0x' || substr(md5('smpl:' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) AS BIGINT) % 100 AS bucket
         FROM documents)
         SELECT doc_id, lang, bucket FROM s
         WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
         ORDER BY doc_id""",
    "q_sample_exact" ->
      """WITH r AS (SELECT doc_id, source,
           CAST(row_number() OVER (PARTITION BY source
             ORDER BY md5('exact:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS sample_rank
         FROM documents)
         SELECT doc_id, source, sample_rank FROM r
         WHERE sample_rank <= 10 ORDER BY source, sample_rank""",
    "q_dedup_incremental" ->
      """WITH f AS (SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
           FROM documents),
         corpus AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250),
         batch AS (SELECT fp, min(doc_id) AS keep_id, count(*) AS n_batch
             FROM f WHERE doc_id >= 250 GROUP BY 1)
         SELECT b.fp, b.keep_id, b.n_batch FROM batch b
         WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
         ORDER BY fp""",
    "q_curate" ->
      """WITH q AS (SELECT doc_id, lang, source,
           CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_filter(string_split(trim(text), ' '),
             x -> list_contains(['the','a','data','row','key'], x))) AS INTEGER) AS n_stop,
           CAST(length(text) AS INTEGER) AS len_text,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
         FROM documents),
         g AS (SELECT * FROM q
           WHERE len_text BETWEEN 20 AND 2000 AND n_tokens >= 5
             AND CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.5),
         r AS (SELECT *, row_number() OVER
             (PARTITION BY fp ORDER BY doc_id) AS rn FROM g)
         SELECT doc_id, lang, source, n_tokens, len_text, fp
         FROM r WHERE rn = 1 ORDER BY doc_id""",
    "q_pack_shards" ->
      """WITH t AS (SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
         FROM documents),
         c AS (SELECT doc_id, n_tokens,
           -- COALESCE pins null-text semantics to the Spark side, whose
           -- running sum counts nulls as zero (a leading all-NULL
           -- prefix would otherwise yield NULL here but 0 there)
           CAST(sum(COALESCE(n_tokens, 0)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
         FROM t)
         SELECT doc_id, n_tokens, cum_tokens,
           (cum_tokens - n_tokens) // 500 AS shard_id
         FROM c ORDER BY doc_id""",
    "q_dsir_weights" ->
      """WITH d AS (SELECT doc_id, (lang = 'en') AS t,
           string_split(trim(text), ' ') AS toks
         FROM documents),
         d2 AS (SELECT doc_id, t, toks FROM d WHERE len(toks) >= 1),
         tk AS (SELECT doc_id, t,
             CAST(CAST(('0x' || substr(md5('cm0:' || unnest(toks)), 1, 8))
               AS UBIGINT) AS BIGINT) % 16 AS b
           FROM d2),
         side AS (SELECT b,
             CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS cq
           FROM tk GROUP BY b),
         tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
             CAST(sum(cq) AS BIGINT) AS tq FROM side),
         sc AS (SELECT b,
             ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 16 AS DOUBLE)) -
             ln(CAST(cq + 1 AS DOUBLE) / CAST(tq + 16 AS DOUBLE)) AS score
           FROM side CROSS JOIN tot)
         SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(sc.score), 6) + 0.0 AS weight_r,
           round(sum(sc.score), 6) > 0 AS keep
         FROM tk JOIN sc ON tk.b = sc.b
         GROUP BY tk.doc_id ORDER BY doc_id""",
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
         FROM documents),
         c AS (SELECT doc_id, n_tokens,
           CAST(sum(COALESCE(n_tokens, 0)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum
         FROM t),
         s AS (SELECT doc_id, n_tokens, cum, cum - n_tokens AS strt
           FROM c WHERE n_tokens > 0),
         e AS (SELECT doc_id, cum, strt,
             unnest(range(strt // 128, (cum - 1) // 128 + 1)) AS seq_id
           FROM s)
         SELECT seq_id, doc_id,
           greatest(0, seq_id * 128 - strt) AS doc_tok_start,
           least(cum, (seq_id + 1) * 128) - greatest(strt, seq_id * 128)
             AS tok_len,
           greatest(0, strt - seq_id * 128) AS seq_off
         FROM e ORDER BY seq_id, doc_id""",
    "q_shard_manifest" ->
      """WITH t AS (SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
         FROM documents),
         c AS (SELECT doc_id, n_tokens, fp,
           CAST(sum(COALESCE(n_tokens, 0)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
         FROM t)
         SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
           md5(string_agg(fp, '' ORDER BY doc_id)) AS shard_fp
         FROM (SELECT doc_id, n_tokens, fp,
             (cum_tokens - n_tokens) // 500 AS shard_id FROM c)
         GROUP BY shard_id ORDER BY shard_id""",
    "q_decontaminate" ->
      """WITH tr AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
             FROM documents WHERE doc_id % 10 <> 0),
         bm AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
             FROM documents WHERE doc_id % 10 = 0),
         trt AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos FROM tr WHERE len(toks) >= 5),
         bmt AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos FROM bm WHERE len(toks) >= 5),
         trs AS (SELECT DISTINCT t1.doc_id,
             t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok
               || ' ' || t5.tok AS shingle
             FROM trt t1
             JOIN trt t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
             JOIN trt t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
             JOIN trt t4 ON t1.doc_id = t4.doc_id AND t4.pos = t1.pos + 3
             JOIN trt t5 ON t1.doc_id = t5.doc_id AND t5.pos = t1.pos + 4),
         bms AS (SELECT DISTINCT
             t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok
               || ' ' || t5.tok AS shingle
             FROM bmt t1
             JOIN bmt t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
             JOIN bmt t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
             JOIN bmt t4 ON t1.doc_id = t4.doc_id AND t4.pos = t1.pos + 3
             JOIN bmt t5 ON t1.doc_id = t5.doc_id AND t5.pos = t1.pos + 4)
         SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         FROM trs t JOIN bms b ON t.shingle = b.shingle
         GROUP BY t.doc_id ORDER BY t.doc_id""",
    "q_decontam_overlap" ->
      """WITH tr AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
             FROM documents WHERE doc_id % 10 <> 0),
         bm AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
             FROM documents WHERE doc_id % 10 = 0),
         trt AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos FROM tr WHERE len(toks) >= 5),
         bmt AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos FROM bm WHERE len(toks) >= 5),
         trs AS (SELECT DISTINCT t1.doc_id,
             t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok
               || ' ' || t5.tok AS shingle
             FROM trt t1
             JOIN trt t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
             JOIN trt t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
             JOIN trt t4 ON t1.doc_id = t4.doc_id AND t4.pos = t1.pos + 3
             JOIN trt t5 ON t1.doc_id = t5.doc_id AND t5.pos = t1.pos + 4),
         bms AS (SELECT DISTINCT
             t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok
               || ' ' || t5.tok AS shingle
             FROM bmt t1
             JOIN bmt t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
             JOIN bmt t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
             JOIN bmt t4 ON t1.doc_id = t4.doc_id AND t4.pos = t1.pos + 3
             JOIN bmt t5 ON t1.doc_id = t5.doc_id AND t5.pos = t1.pos + 4),
         j AS (SELECT t.doc_id, count(*) AS n_shingles,
             count(b.shingle) AS n_hits
             FROM trs t LEFT JOIN bms b ON t.shingle = b.shingle
             GROUP BY t.doc_id HAVING count(b.shingle) >= 1)
         SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
             CAST(n_hits AS BIGINT) AS n_hits,
             round(CAST(n_hits AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
               AS contam_frac
         FROM j ORDER BY doc_id""",
    "q_split_assign" ->
      """WITH s AS (SELECT doc_id, lang,
           CAST(CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) AS BIGINT) % 100 AS bucket
         FROM documents)
         SELECT doc_id, lang, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
         FROM s ORDER BY doc_id""",
    "q_pii_redact" -> {
      // ONE pattern source: the library rules are interpolated into
      // the oracle text, so the two sides cannot drift (patterns use
      // only Java-regex/RE2-agreeing constructs and contain no quotes)
      val Seq((email, _), (phone, _), (ip, _), (ssn, _), (iban, _)) =
        Corpus.defaultPiiRules
      s"""WITH a AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
             || CASE WHEN doc_id % 3 = 0
                  THEN ' tel +1-555-' ||
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                  THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                  ELSE '' END
             || CASE WHEN doc_id % 4 = 0
                  THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                    || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                    || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                  THEN ' iban GB' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                    || 'GRAFT0' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS aug
         FROM documents),
         s1 AS (SELECT doc_id, aug,
             regexp_replace(aug, '$email', '<EMAIL>', 'g') AS c1 FROM a),
         s2 AS (SELECT doc_id, aug, c1,
             regexp_replace(c1, '$phone', '<PHONE>', 'g') AS c2 FROM s1),
         s3 AS (SELECT doc_id, aug, c1, c2,
             regexp_replace(c2, '$ip', '<IP>', 'g') AS c3 FROM s2),
         s4 AS (SELECT doc_id, aug, c1, c2, c3,
             regexp_replace(c3, '$ssn', '<SSN>', 'g') AS c4 FROM s3)
         SELECT doc_id,
           regexp_replace(c4, '$iban', '<IBAN>', 'g') AS clean,
           CAST(len(regexp_extract_all(aug, '$email')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(c1, '$phone')) AS INTEGER) AS n_phone,
           CAST(len(regexp_extract_all(c2, '$ip')) AS INTEGER) AS n_ip,
           CAST(len(regexp_extract_all(c3, '$ssn')) AS INTEGER) AS n_ssn,
           CAST(len(regexp_extract_all(c4, '$iban')) AS INTEGER) AS n_iban
         FROM s4 ORDER BY doc_id"""
    },
    "q_domain_mix" ->
      """WITH t AS (SELECT source,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
         FROM documents),
         per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
           FROM t GROUP BY 1),
         tot AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS w_total
           FROM per)
         SELECT source, n_docs, n_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)) / w_total, 6) AS weight
         FROM per CROSS JOIN tot ORDER BY source""",
    "q_chunk_tokens" ->
      """WITH tk AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
           FROM documents
           WHERE len(string_split(trim(text), ' ')) >= 1),
         s AS (SELECT doc_id, toks,
             unnest(range(1, greatest(1, len(toks) - 16) + 1, 48)) AS st
           FROM tk)
         SELECT doc_id, CAST((st - 1) // 48 AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(toks, st, st + 63), ' ') AS chunk,
           CAST(len(list_slice(toks, st, st + 63)) AS INTEGER)
             AS n_chunk_tokens
         FROM s ORDER BY doc_id, chunk_idx""",
    "q_pipeline_e2e" ->
      """WITH q AS (SELECT doc_id, lang, source,
           CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_filter(string_split(trim(text), ' '),
             x -> list_contains(['the','a','data','row','key'], x))) AS INTEGER) AS n_stop,
           CAST(length(text) AS INTEGER) AS len_text,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
         FROM documents),
         g AS (SELECT * FROM q
           WHERE len_text BETWEEN 20 AND 2000 AND n_tokens >= 5
             AND CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.5),
         r AS (SELECT *, row_number() OVER
             (PARTITION BY fp ORDER BY doc_id) AS rn FROM g),
         kept AS (SELECT doc_id, n_tokens FROM r WHERE rn = 1),
         tr AS (SELECT d.doc_id, string_split(trim(d.text), ' ') AS toks
           FROM documents d JOIN kept k ON d.doc_id = k.doc_id
           WHERE d.doc_id % 10 <> 0),
         bm AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
           FROM documents WHERE doc_id % 10 = 0),
         trt AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos FROM tr WHERE len(toks) >= 5),
         bmt AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos FROM bm WHERE len(toks) >= 5),
         trs AS (SELECT DISTINCT t1.doc_id,
             t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok
               || ' ' || t5.tok AS shingle
             FROM trt t1
             JOIN trt t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
             JOIN trt t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
             JOIN trt t4 ON t1.doc_id = t4.doc_id AND t4.pos = t1.pos + 3
             JOIN trt t5 ON t1.doc_id = t5.doc_id AND t5.pos = t1.pos + 4),
         bms AS (SELECT DISTINCT
             t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok
               || ' ' || t5.tok AS shingle
             FROM bmt t1
             JOIN bmt t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
             JOIN bmt t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
             JOIN bmt t4 ON t1.doc_id = t4.doc_id AND t4.pos = t1.pos + 3
             JOIN bmt t5 ON t1.doc_id = t5.doc_id AND t5.pos = t1.pos + 4),
         flagged AS (SELECT DISTINCT t.doc_id
           FROM trs t JOIN bms b ON t.shingle = b.shingle),
         clean AS (SELECT t.doc_id FROM tr t
           WHERE NOT EXISTS (SELECT 1 FROM flagged f
             WHERE f.doc_id = t.doc_id)),
         train AS (SELECT c.doc_id, k.n_tokens
           FROM clean c JOIN kept k ON c.doc_id = k.doc_id
           WHERE CAST(CAST(('0x' || substr(md5('split:' || CAST(c.doc_id AS VARCHAR)), 1, 8))
             AS UBIGINT) AS BIGINT) % 100 < 80),
         cum AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum(COALESCE(n_tokens, 0)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
         FROM train)
         SELECT doc_id, n_tokens, cum_tokens,
           (cum_tokens - n_tokens) // 500 AS shard_id
         FROM cum ORDER BY doc_id""",
    "q_unigram_incremental" ->
      """WITH corpus AS (SELECT unnest(string_split(trim(text), ' ')) AS tok
           FROM documents WHERE doc_id < 250),
         vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
           FROM corpus GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
         bt AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
           FROM documents WHERE doc_id >= 250),
         j AS (SELECT b.doc_id, v.cnt
           FROM bt b LEFT JOIN vocab v ON b.tok = v.tok),
         a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(*) FILTER (cnt IS NULL) AS BIGINT) AS n_oov,
             round(avg(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))), 6)
               AS nll
           FROM j CROSS JOIN tot GROUP BY doc_id)
         SELECT doc_id, n_tokens, n_oov, nll FROM a
         WHERE nll IS NOT NULL ORDER BY doc_id""",
    "q_mix_sample" ->
      """WITH t AS (SELECT source,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
         FROM documents),
         per AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
           FROM t GROUP BY 1),
         tot AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS w_total
           FROM per),
         mix AS (SELECT source,
             CAST(floor(round(sqrt(CAST(n_tokens AS DOUBLE)) / w_total, 6)
               * 400) AS BIGINT) AS rate_pct
           FROM per CROSS JOIN tot),
         b AS (SELECT doc_id, source,
             CAST(CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS UBIGINT) AS BIGINT) % 100 AS bucket
           FROM documents)
         SELECT b.doc_id, b.source, b.bucket, m.rate_pct
         FROM b JOIN mix m USING (source)
         WHERE b.bucket < m.rate_pct ORDER BY doc_id""",
    // add-1-smoothed per-token KL(new‖ref) contributions between the
    // 'en' slice and the rest; counts/totals exact BIGINT, only the
    // final probabilities/contribution are rounded doubles
    "q_corpus_drift" ->
      """WITH rc AS (SELECT unnest(string_split(trim(text), ' ')) AS tok
           FROM documents WHERE lang = 'en'),
         nc AS (SELECT unnest(string_split(trim(text), ' ')) AS tok
           FROM documents WHERE lang <> 'en'),
         r AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_ref
           FROM rc GROUP BY 1),
         n AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_new
           FROM nc GROUP BY 1),
         j AS (SELECT coalesce(r.tok, n.tok) AS tok,
             coalesce(c_ref, 0) AS c_ref, coalesce(c_new, 0) AS c_new
           FROM r FULL OUTER JOIN n ON r.tok = n.tok),
         t AS (SELECT CAST(sum(c_ref) AS BIGINT) AS t_ref,
             CAST(sum(c_new) AS BIGINT) AS t_new,
             CAST(count(*) AS BIGINT) AS v FROM j),
         p AS (SELECT tok, c_ref, c_new,
             CAST(c_ref + 1 AS DOUBLE) / CAST(t_ref + v AS DOUBLE) AS p_ref,
             CAST(c_new + 1 AS DOUBLE) / CAST(t_new + v AS DOUBLE) AS p_new
           FROM j CROSS JOIN t)
         SELECT tok, c_ref, c_new,
           round(p_ref, 6) AS p_ref_r, round(p_new, 6) AS p_new_r,
           round(p_new * ln(p_new / p_ref), 6) AS kl_contrib
         FROM p ORDER BY kl_contrib DESC, tok LIMIT 25""",
    "q_k_anon" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows,
           count(*) < 15 AS suppress
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
    // cumulative counts stay integer until one exact division each,
    // so the ECDF gaps — and their bounded sum — compare exactly
    "q_t_closeness" ->
      """WITH d AS (SELECT lang, source, n_chars // 200 AS sb
           FROM documents),
         gb AS (SELECT lang, source, sb, CAST(count(*) AS BIGINT) AS n
           FROM d GROUP BY 1, 2, 3),
         grp AS (SELECT lang, source, CAST(sum(n) AS BIGINT) AS n_rows
           FROM gb GROUP BY 1, 2),
         gl AS (SELECT sb, CAST(count(*) AS BIGINT) AS gn
           FROM d GROUP BY 1),
         tt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM d),
         nb AS (SELECT CAST(count(*) AS BIGINT) AS m FROM gl),
         sc AS (SELECT g.lang, g.source, g.n_rows, s.sb, s.gn
           FROM grp g CROSS JOIN gl s),
         j AS (SELECT sc.*, coalesce(gb.n, 0) AS n
           FROM sc LEFT JOIN gb ON gb.lang = sc.lang
             AND gb.source = sc.source AND gb.sb = sc.sb),
         c AS (SELECT *, CAST(sum(n) OVER
             (PARTITION BY lang, source ORDER BY sb) AS BIGINT) AS cn,
             CAST(sum(gn) OVER
             (PARTITION BY lang, source ORDER BY sb) AS BIGINT) AS cg
           FROM j),
         e AS (SELECT lang, source, n_rows,
             sum(abs(CAST(cn AS DOUBLE) / n_rows
               - CAST(cg AS DOUBLE) / nt)) AS emd
           FROM c CROSS JOIN tt GROUP BY 1, 2, 3)
         SELECT e.lang, e.source, e.n_rows,
           round(e.emd / GREATEST(nb.m - 1, 1), 6) AS emd_r,
           round(e.emd / GREATEST(nb.m - 1, 1), 6) > 0.15 AS breach
         FROM e CROSS JOIN nb ORDER BY lang, source""",
    "q_weighted_sample" ->
      """WITH k AS (SELECT lang, doc_id, n_chars,
             round(-ln((CAST(CAST(('0x' ||
                 substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))
                 AS UBIGINT) AS BIGINT) + 1) / 4294967296.0)
               / CAST(n_chars AS DOUBLE), 6) + 0.0 AS k_r
           FROM documents WHERE n_chars > 0),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
             ORDER BY k_r, doc_id) AS BIGINT) AS rank
           FROM k)
         SELECT lang, doc_id, n_chars, k_r, rank FROM r
         WHERE rank <= 5 ORDER BY lang, rank""",
    "q_chi_square" ->
      """WITH o AS (SELECT lang, source, count(*) AS o
           FROM documents GROUP BY 1, 2),
         r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt
           FROM o GROUP BY 1),
         c AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct
           FROM o GROUP BY 1),
         nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
         j AS (SELECT o.lang, o.source, o.o,
             CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE)
               / CAST(nn.n AS DOUBLE) AS e
           FROM o JOIN r ON r.lang = o.lang
             JOIN c ON c.source = o.source CROSS JOIN nn)
         SELECT lang, source, o, round(e, 6) AS e_r,
           round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 6)
             AS contrib_r
         FROM j ORDER BY lang, source""",
    "q_snapshot_diff" ->
      """WITH oldsnap AS (SELECT doc_id, source, md5(text) AS fp
           FROM documents),
         newsnap AS (
           SELECT doc_id, source,
             CASE WHEN lang = 'de' THEN md5(text || ' [rev2]')
               ELSE md5(text) END AS fp
           FROM documents WHERE doc_id % 10 <> 7
           UNION ALL
           SELECT doc_id + 1000000, source, md5('new:' || text)
           FROM documents WHERE doc_id < 50),
         st AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.fp = n.fp THEN 'unchanged'
                  ELSE 'changed' END AS status
           FROM oldsnap o FULL OUTER JOIN newsnap n
             ON o.doc_id = n.doc_id),
         srcmap AS (SELECT DISTINCT doc_id, source FROM
           (SELECT doc_id, source FROM oldsnap
            UNION ALL SELECT doc_id, source FROM newsnap))
         SELECT m.source, s.status, count(*) AS n
         FROM st s JOIN srcmap m ON m.doc_id = s.doc_id
         GROUP BY 1, 2 ORDER BY source, status""",
    "q_l_diversity" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_sensitive,
           count(DISTINCT user_id) < 55 AS suppress
         FROM events GROUP BY 1, 2 ORDER BY event_type, day""",
    // the full merge computed directly — the partial (touched-only)
    // rewrite must be indistinguishable from it
    "q_cow_merge" ->
      """WITH all_rev AS (
           SELECT doc_id, lang, text, CAST(1 AS BIGINT) AS version
           FROM documents
           UNION ALL
           SELECT doc_id, lang, text || ' [rev2]', CAST(2 AS BIGINT)
           FROM documents WHERE lang = 'de'),
         r AS (SELECT doc_id, lang, version, md5(text) AS fp,
             row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
           FROM all_rev)
         SELECT doc_id, lang, version, fp FROM r WHERE rn = 1
         ORDER BY doc_id""",
    // q_curate's gate predicate + corpus-wide fingerprint counts,
    // reduced to per-source totals
    "q_dataset_card" ->
      """WITH d AS (SELECT doc_id, source,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks,
           (length(text) BETWEEN 20 AND 2000
             AND len(string_split(trim(text), ' ')) >= 5
             AND CAST(len(list_filter(string_split(trim(text), ' '),
                 x -> list_contains(['the','a','data','row','key'], x)))
               AS DOUBLE) / CAST(len(string_split(trim(text), ' '))
               AS DOUBLE) <= 0.5) AS q
         FROM documents),
         fc AS (SELECT fp, count(*) AS n_fp FROM d GROUP BY 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         FROM d JOIN fc USING (fp)
         GROUP BY source ORDER BY source""",
    "q_upsert" ->
      """WITH all_rev AS (
           SELECT doc_id, text, CAST(1 AS BIGINT) AS version FROM documents
           UNION ALL
           SELECT doc_id, text || ' [rev2]', CAST(2 AS BIGINT)
           FROM documents WHERE doc_id % 3 = 0),
         r AS (SELECT doc_id, version, md5(text) AS fp,
             row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
           FROM all_rev)
         SELECT doc_id, version, fp FROM r WHERE rn = 1 ORDER BY doc_id""",
    // phase boundaries are exact integer floor-division; the
    // within-phase order is the md5-of-id string order on both engines
    "q_curriculum" ->
      """WITH d AS (SELECT doc_id,
             len(string_split(trim(text), ' ')) AS n_tokens
           FROM documents),
         r AS (SELECT doc_id, n_tokens, CAST(row_number() OVER
             (ORDER BY n_tokens, doc_id) AS BIGINT) AS rn FROM d),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d),
         p AS (SELECT doc_id, n_tokens,
             CAST(((rn - 1) * 10) // n_total AS INTEGER) AS phase
           FROM r CROSS JOIN t)
         SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, phase,
           CAST(row_number() OVER (PARTITION BY phase
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
             AS ord
         FROM p ORDER BY phase, ord""",
    // the ratio is an exact integer quotient (bit-identical cross-
    // engine); within-source rank tie-breaks on doc_id both sides
    "q_pref_pairs" ->
      """WITH sc AS (SELECT doc_id, source,
             CAST(len(list_filter(string_split(trim(text), ' '),
               x -> list_contains(['the','a','data','row','key'], x)))
               AS DOUBLE)
               / CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS r
           FROM documents
           WHERE len(string_split(trim(text), ' ')) >= 1),
         rk AS (SELECT doc_id, source, r,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY r, doc_id) AS BIGINT) AS ord,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cnt
           FROM sc),
         ch AS (SELECT source, doc_id AS chosen_id, r AS cr
           FROM rk WHERE cnt >= 6 AND ord <= 3),
         rj AS (SELECT source, doc_id AS rejected_id, r AS rr
           FROM rk WHERE cnt >= 6 AND ord > cnt - 3)
         SELECT c.source, c.chosen_id, r.rejected_id,
           round(r.rr - c.cr, 6) AS gap_r
         FROM ch c JOIN rj r ON c.source = r.source
         ORDER BY c.source, c.chosen_id, r.rejected_id""")
}
