package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the
  * train-a-tokenizer-on-the-corpus shape of an LLM data platform.
  *
  * The classic algorithm (Sennrich et al., ACL 2016): start from
  * per-character splits of every distinct word, repeatedly (1) count
  * adjacent symbol pairs weighted by word frequency, (2) merge the
  * most frequent pair everywhere, left-to-right non-overlapping.
  *
  * Scale stance: ALL per-round state lives in one vocabulary-sized
  * DataFrame (word, n, syms) — the corpus is scanned ONCE to build
  * word counts; every subsequent round touches only distinct words,
  * so a 100 TB corpus and a 100 GB corpus pay the same per-round cost
  * (|vocab| rows). Per BATCH (up to `batchK` merges — see
  * [[trainMerges]] for the sequence-identity proof): one exploded
  * pair aggregate (map-side combined), a top-(k+1) argmax collect
  * (bounded by construction), and a composed per-word fold applying
  * every accepted merge. The fold is a higher-order
  * `aggregate` — interpreted, not codegen'd (CLAUDE.md's HOF rule),
  * which is the right trade HERE because it runs over the vocabulary,
  * not the corpus. Each round cuts the nesting plan with a lazy
  * localCheckpoint (the TextDedup.clusters rule: persist caches data,
  * not the plan).
  *
  * Cross-engine gate: the merge sequence is deterministic (argmax
  * tie-broken by (count DESC, left, right)), so the oracle unrolls
  * the rounds into MATERIALIZED CTEs — the PageRank/BFS pattern —
  * with the greedy left-to-right fold expressed in closed form (runs
  * of consecutive match positions keep even offsets). Both
  * `q_bpe_merges` and `q_bpe_segment` are hash-gated; BpeTrainerSpec
  * additionally pins the trainer against an independent driver-side
  * reference implementation.
  */
object BpeTrainer {

  /** Spark's UTF8String binary order — unsigned byte-wise over UTF-8
    * bytes — for driver-side re-sorts of Spark-ordered collects. Java
    * String order is UTF-16 code-unit order, which ranks a
    * supplementary-plane symbol (surrogate pair, units 0xD800–0xDFFF)
    * BEFORE a BMP char in [U+E000, U+FFFF]; UTF-8 bytes (0xF0–0xF4 vs
    * 0xEE–0xEF lead) rank it AFTER. A batched trainer re-sorting a
    * collected candidate list with Java order could therefore pick a
    * different count-tie winner than the Spark orderBy/limit and the
    * sequential argmax it must stay sequence-identical to.
    */
  private[graft] object Utf8Order extends Ordering[String] {
    def compare(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** One learned merge: `rank`-th rule joins (left, right) into one
    * symbol; `count` is the weighted pair frequency when chosen.
    */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** `actions` counts the driver-side Spark actions training issued
    * (collects + eager checkpoints) — the batched-training win a spec
    * can assert on; 0 for models not produced by training.
    */
  final case class Model(
      merges: Seq[Merge],
      vocab: DataFrame /* word, n, syms (post-merge symbol split) */,
      actions: Int = 0)

  /** Character split of a word; the trailing empty string Spark's
    * split-by-"" emits is filtered out. Shared with
    * [[WordPieceTrainer]] (which marks continuations on top).
    */
  private[ops] def charSplit(word: Column): Column =
    filter(split(word, ""), x => x =!= "")

  /** Apply one merge (left, right) → `joined` to a symbol array,
    * left-to-right non-overlapping, as a higher-order fold: carry
    * (out, prev); a prev==left followed by right emits the joined
    * symbol and clears prev, anything else flushes prev. BPE joins
    * as `left + right`; WordPiece strips the continuation marker off
    * `right` first — one fold body serves both trainers (the shared
    * pairFold rule).
    */
  private[ops] def applyMerge(syms: Column, left: String, right: String,
      joined: String): Column = {
    def state(out: Column, prev: Column) =
      struct(out.as("out"), prev.cast("string").as("prev"))
    aggregate(
      syms,
      state(array().cast("array<string>"), lit(null)),
      (acc, x) => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        when(prev === lit(left) && x === lit(right),
          state(concat(out, array(lit(joined))), lit(null)))
          .when(prev.isNull, state(out, x))
          .otherwise(state(concat(out, array(prev)), x))
      },
      acc => when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("prev")))))
  }

  /** The per-round pair-count frame over the current word table —
    * shared by the sequential and batched trainers (and, with the
    * continuation-marked split, by [[WordPieceTrainer]]).
    */
  private[ops] def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("n")).as("cnt"))

  /** Train up to `nMerges` merges over the whitespace words of
    * `df.textCol`; stops early when the best remaining pair's
    * weighted count falls below `minCount`.
    *
    * BATCHED (the parallel-BPE trick, provably sequence-identical):
    * one driver action collects the top `batchK`+1 candidate pairs,
    * and the longest SAFE prefix of that list is applied in one
    * composed fold + one lazy checkpoint — so a 32k-merge production
    * vocab costs ~32k/fill driver round-trips instead of 32k, and a
    * batched ROUND costs exactly what a sequential round costs (one
    * argmax collect; the r17 change: the per-round vocab-sized
    * collision-symbol join is replaced by a driver-maintained symbol
    * SUPERSET — see below — so with realized fill >= 1 batching
    * strictly dominates sequential on every corpus, including the
    * tie-saturated ones where fill ~2). Candidate j (after the
    * unconditional argmax) is safe exactly when applying the earlier
    * accepted merges provably cannot change what sequential training
    * would pick at its sub-round:
    *  - its symbols are disjoint from every earlier accepted merge's
    *    {left, right, joined} (its own count and everything it could
    *    create stay untouched; accepted pairs drop to count 0);
    *  - its count strictly exceeds the (k+1)-th row's (every pair
    *    that could interfere is VISIBLE in the collected rows);
    *  - no visible non-accepted pair with EQUAL count touches an
    *    accepted symbol (counts never increase, and a new pair's
    *    count is bounded by its touched parent's — an equal-count
    *    touched pair is the only way a tie against candidate j can
    *    appear whose (l, r) tiebreak we cannot order).
    * A batch also ends right AFTER accepting a merge whose joined
    * string already exists as a symbol (count conflation), repeats an
    * earlier joined string, or has left == right (a run like `r r r`
    * yields new (joined, r) pairs bounded by the ACCEPTED pair's own
    * count, which may exceed later candidates') — each a documented
    * escape to sequential semantics, never a wrong sequence.
    *
    * The conflation escape tests membership against a driver-held
    * symbol SUPERSET (initial alphabet ∪ every accepted joined
    * string) instead of joining the live symbol set per round: every
    * symbol a words row can hold is an original character or the
    * joined of an applied merge, so the superset provably contains
    * the live set at every round; the only divergence is a symbol
    * that has been merged AWAY, and treating it as alive can only end
    * a batch EARLY — an escape, never a wrong acceptance. Bounded by
    * charset + nMerges; costs one charset-bounded collect at init
    * and removes the batch machinery's dominant per-round cost.
    * Batched ≡ sequential is additionally fuzz-pinned in
    * BpeTrainerSpec against [[trainMergesSequential]] and the
    * driver-side reference.
    */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      nMerges: Int,
      minCount: Long = 2L,
      batchK: Int = 16): Model = {
    require(nMerges >= 0 && minCount >= 1,
      s"need nMerges >= 0 and minCount >= 1, got $nMerges / $minCount")
    require(batchK >= 1, s"batchK must be >= 1, got $batchK")
    var actions = 0
    // lazy checkpoint (cut the corpus scan off the loop plans, the
    // sequential trainer's rule) — the alphabet collect right below
    // is the materializing action, and each round's single argmax
    // collect reads words from ONE subtree (pair counts), so nothing
    // re-runs the fold chain
    var words = initWords(df, textCol).localCheckpoint(false)
    // the live-symbol superset (see scaladoc): charset-bounded collect
    var symsSuper = words.select(explode(col("syms")).as("sym"))
      .distinct().collect().map(_.getString(0)).toSet
    actions += 1
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      // acceptance is capped at the merges still wanted, but the
      // COLLECTED list stays batchK+1 wide — the sentinel fence must
      // reflect what exists, not what we want (a shrunken limit reads
      // as "full" and blinds the visibility guards)
      val k = math.min(batchK, nMerges - r)
      // TakeOrderedAndProject: the collect returns rows in the Spark
      // UTF8-binary argmax order (no join to break it — a driver
      // re-sort would need Utf8Order, never Java String order)
      val rows = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(batchK + 1) // +1 sentinel: the visibility fence for ties
        .collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
      actions += 1
      if (rows.isEmpty) done = true
      else {
        val full = rows.length == batchK + 1
        val hiddenTail = if (full) rows.last._3 else 0L
        val considered = rows.take(k)
        val accepted = Seq.newBuilder[(String, String, Long)]
        var used = Set.empty[String]
        var stop = false
        var idx = 0 // == number accepted so far (the prefix property)
        while (idx < considered.length && !stop) {
          val (l, rt, cnt) = considered(idx)
          val joined = l + rt
          val jExists = symsSuper.contains(joined)
          val safe =
            if (idx == 0) cnt >= minCount // the true argmax, always safe
            else {
              val touched = used.contains(l) || used.contains(rt)
              // rows 0..idx-1 are accepted (consumed — count drops to
              // 0, not a threat); scan only the non-accepted remainder
              // incl. the sentinel for an equal-count TOUCHED pair
              val eqThreat = rows.drop(idx + 1).exists { q =>
                q._3 == cnt && (used.contains(q._1) || used.contains(q._2))
              }
              cnt >= minCount && cnt > hiddenTail && !touched && !eqThreat
            }
          if (!safe) {
            if (idx == 0) done = true // argmax under minCount: trained out
            stop = true
          } else {
            accepted += ((l, rt, cnt))
            val collides = jExists || used.contains(joined) || l == rt
            used = used + l + rt + joined
            if (collides) stop = true
            idx += 1
          }
        }
        val acc = accepted.result()
        if (acc.nonEmpty) {
          var syms: Column = col("syms")
          acc.foreach { case (l, rt, _) =>
            syms = applyMerge(syms, l, rt, l + rt)
          }
          acc.foreach { case (l, rt, cnt) =>
            merges += Merge(r, l, rt, cnt); r += 1
            symsSuper = symsSuper + (l + rt) // joineds join the superset
          }
          // lazy: the next round's argmax collect (ONE subtree over
          // words) materializes it — one job per round, like the
          // sequential trainer
          words = words.withColumn("syms", syms).localCheckpoint(false)
        }
      }
    }
    Model(merges.result(), words, actions)
  }

  /** The one-merge-per-action reference loop [[trainMerges]] batches:
    * kept for the batched-equals-sequential spec pins (and as the
    * executable definition of the merge order).
    */
  private[graft] def trainMergesSequential(
      df: DataFrame,
      textCol: String,
      nMerges: Int,
      minCount: Long = 2L): Model = {
    require(nMerges >= 0 && minCount >= 1,
      s"need nMerges >= 0 and minCount >= 1, got $nMerges / $minCount")
    var actions = 0
    var words = initWords(df, textCol)
      .localCheckpoint(false) // cut the corpus scan off the loop plans
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1) // the argmax row — the only driver-sized collect
        .collect()
      actions += 1
      top.headOption.filter(_.getLong(2) >= minCount) match {
        case None => done = true
        case Some(row) =>
          val (l, rt, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Merge(r, l, rt, cnt)
          // lazy localCheckpoint: materialized by the NEXT round's
          // argmax action, so each round stays one job
          words = words
            .withColumn("syms", applyMerge(col("syms"), l, rt, l + rt))
            .localCheckpoint(false)
          r += 1
      }
    }
    Model(merges.result(), words, actions)
  }

  private def initWords(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextDedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", charSplit(col("word")))

  /** Segment a corpus with a trained model: words join the trained
    * vocabulary's final symbol split (keyed join, NO broadcast hint —
    * a corpus vocabulary is unbounded, AQE decides); out-of-vocabulary
    * words fall back to their character split (no merges — the
    * conservative untrained segmentation). Output: (idCol, word_pos,
    * word, sub_pos, subword), both positions 0-based longs.
    */
  def segment(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame =
    df.select(col(idCol),
        posexplode(TextDedup.tokens(col(textCol))).as(Seq("word_pos", "word")))
      .filter(length(col("word")) > 0)
      .join(model.vocab.select(col("word"), col("syms")), Seq("word"), "left")
      .withColumn("syms", coalesce(col("syms"), charSplit(col("word"))))
      .select(col(idCol), col("word_pos").cast("long").as("word_pos"),
        col("word"),
        posexplode(col("syms")).as(Seq("sub_pos", "subword")))
      .withColumn("sub_pos", col("sub_pos").cast("long"))
      .select(col(idCol), col("word_pos"), col("word"),
        col("sub_pos"), col("subword"))
}
