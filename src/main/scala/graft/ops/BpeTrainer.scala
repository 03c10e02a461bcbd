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
  * (|vocab| rows). Per round: one exploded pair aggregate (map-side
  * combined), a 1-row argmax collect (bounded by construction), and a
  * per-word fold applying the merge. The fold is a higher-order
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

  /** One learned merge: `rank`-th rule joins (left, right) into one
    * symbol; `count` is the weighted pair frequency when chosen.
    */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  final case class Model(
      merges: Seq[Merge],
      vocab: DataFrame /* word, n, syms (post-merge symbol split) */)

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

  /** Train up to `nMerges` merges over the whitespace words of
    * `df.textCol`; stops early when the best remaining pair's
    * weighted count falls below `minCount`.
    */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      nMerges: Int,
      minCount: Long = 2L): Model = {
    require(nMerges >= 0 && minCount >= 1,
      s"need nMerges >= 0 and minCount >= 1, got $nMerges / $minCount")
    var words = df
      .select(explode(TextDedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", charSplit(col("word")))
      .localCheckpoint(false) // cut the corpus scan off the loop plans
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1) // the argmax row — the only driver-sized collect
        .collect()
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
    Model(merges.result(), words)
  }

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
