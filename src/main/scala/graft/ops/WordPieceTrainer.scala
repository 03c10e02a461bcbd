package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training + greedy serving — the
  * third tokenizer family beside [[BpeTrainer]] (frequency-scored
  * merges) and [[UnigramLmTrainer]] (prune-down EM): WordPiece
  * (Schuster & Nakajima, ICASSP 2012; the BERT tokenizer) merges the
  * adjacent pair maximizing the LIKELIHOOD gain
  *
  *   score(l, r) = count(l r) / (count(l) · count(r))
  *
  * over continuation-marked symbols (word-initial pieces bare,
  * non-initial prefixed `##`), and serves with greedy longest-match
  * ("max munch") — NOT the training-time splits — with a whole-word
  * `[UNK]` fallback, exactly BERT's WordpieceTokenizer contract.
  *
  * Scale stance mirrors [[BpeTrainer]]: the corpus is scanned once
  * into a vocabulary-sized (word, n, syms) frame; every round is two
  * small aggregates over that frame (pair counts + unigram counts),
  * a 1-row argmax collect (bounded by construction), and the shared
  * [[BpeTrainer.applyMerge]] fold; rounds cut lineage with lazy
  * localCheckpoints. Serving broadcasts the piece inventory inside a
  * mapPartitions closure — bounded by construction at
  * |alphabet| + nMerges entries (the LIMIT-k broadcast rule).
  *
  * Cross-engine determinism: the argmax orders by (score DESC, l, r).
  * The score doubles are bit-identical on any engine — cnt, lc, rc
  * are exact in double (< 2^53), the product and the division are
  * each correctly rounded once, and the association is fixed as
  * cnt / (lc · rc) — so an oracle can replay the rounds verbatim.
  */
object WordPieceTrainer {

  final case class Merge(rank: Int, left: String, right: String,
      count: Long, score: Double)

  /** `pieces` is the serving inventory: every continuation-marked
    * single character of the training corpus plus each merge's joined
    * symbol (BERT keeps constituents when a merge product enters the
    * vocab). `maxBodyLen` bounds the greedy lookahead. `actions`
    * counts the driver-side Spark actions training issued (collects +
    * eager checkpoints) — the batched-training win a spec asserts on.
    */
  final case class Model(
      merges: Seq[Merge],
      vocab: DataFrame /* word, n, syms (post-merge marked split) */,
      pieces: Seq[String],
      maxBodyLen: Int,
      actions: Int = 0)

  private[graft] def stripCont(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** Continuation-marked character split: first char bare, the rest
    * `##`-prefixed — the symbol alphabet WordPiece trains over.
    */
  private def markedSplit(word: Column): Column =
    transform(BpeTrainer.charSplit(word),
      (x, i) => when(i === 0, x).otherwise(concat(lit("##"), x)))

  /** The per-round scored candidate frame: pair counts ≥ `minCount`
    * joined to the unigram counts, scored cnt / (lc · rc) — the fixed
    * association mirrored verbatim in the oracle's unrolled rounds.
    * Shared by the batched and sequential trainers.
    */
  private def scoredPairs(words: DataFrame, minCount: Long): DataFrame = {
    val uni = words.select(col("n"), explode(col("syms")).as("sym"))
      .groupBy("sym").agg(sum(col("n")).as("uc"))
    BpeTrainer.pairCounts(words)
      .filter(col("cnt") >= minCount)
      .join(uni.select(col("sym").as("l"), col("uc").as("lc")), "l")
      .join(uni.select(col("sym").as("r"), col("uc").as("rc")), "r")
      .withColumn("score", col("cnt").cast("double") /
        (col("lc").cast("double") * col("rc").cast("double")))
      // pin the column order — the keyed joins moved the join keys
      // to the front
      .select(col("l"), col("r"), col("cnt"), col("lc"), col("rc"),
        col("score"))
  }

  private def initWords(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextDedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", markedSplit(col("word")))

  /** One collected candidate row. */
  private final case class Cand(l: String, r: String, cnt: Long,
      lc: Long, rc: Long, score: Double)

  /** Train up to `nMerges` likelihood-scored merges over the
    * whitespace words of `df.textCol`; a round stops early when no
    * remaining pair has weighted count >= `minCount`.
    *
    * BATCHED, sequence-identical (the [[BpeTrainer.trainMerges]]
    * discipline in the SCORE domain, where the proof is harder
    * because merging (l, r) SHRINKS the unigram counts of l and r —
    * a surviving pair that touches them can have its score RISE).
    * One driver action collects the top `batchK`+1 scored candidates
    * (the conflation escape tests the joined string against the
    * driver-held symbol SUPERSET — alphabet ∪ accepted joineds, the
    * [[BpeTrainer.trainMerges]] r17 rule: a superset can only end a
    * batch EARLY, and it removes the per-round vocab-sized symbol
    * join); candidate j after the
    * unconditional argmax is accepted only when
    *  - its symbols are disjoint from every earlier accepted merge's
    *    {left, right, joined} (its own cnt, lc, rc — hence its exact
    *    recorded score — are untouched), and
    *  - no pair that COULD now outscore it exists: every threat is a
    *    pair touching an accepted symbol (directly, or as the parent
    *    a new joined-symbol pair inherits its count from), so its
    *    post-batch score is bounded by preMax · F² · I², where preMax
    *    is the largest pre-batch score over visible touched
    *    non-accepted rows and the (k+1)-th sentinel (hidden pairs
    *    score ≤ the sentinel), F = max over accepted sides s of
    *    uc(s)/(uc(s) − cnt) bounds denominator shrinkage (uc drops by
    *    at most the merge count), and I = max of 2·max(lc, rc)/cnt
    *    bounds a new pair's score against its parent's (the joined
    *    symbol's count is ≥ cnt/2). preMax = 0 — possible only when
    *    the candidate list is NOT full — means no touched pair exists
    *    at all, so nothing can move and the candidate is safe
    *    unconditionally. Strictness carries a 1e-9 relative guard so
    *    a driver-side product cannot round past a Spark-computed tie.
    * A batch ends right after accepting a merge whose joined string
    * already exists as a symbol, repeats an earlier joined string, or
    * has left == right (same escapes as BPE — the new-pair bound
    * would otherwise inherit the ACCEPTED pair's own count/score).
    * This guard is deliberately conservative: real WordPiece merges
    * chain on fresh joined symbols and batch small — correctness
    * never depends on batch size, and the fuzz spec pins batched ≡
    * [[trainMergesSequential]] on random corpora.
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
    // lazy init checkpoint — the alphabet collect right below is the
    // materializing action; the PER-ROUND checkpoints stay EAGER (the
    // batch plan reads `words` from three subtrees: pair counts + uni
    // joined twice, whose exchanges run as separate driver jobs — a
    // lazy checkpoint would recompute the fold chain per subtree, the
    // q_pca_power rule). The eager round checkpoint replaces the
    // sequential trainer's per-round count(), one per batch.
    var words = initWords(df, textCol).localCheckpoint(false)
    // the alphabet collect is bounded by the charset (distinct marked
    // single characters), never by the corpus
    val alphabet = words.select(explode(col("syms")).as("sym"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    actions += 1
    // live-symbol superset for the conflation escape (see scaladoc)
    var symsSuper = alphabet.toSet
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      // acceptance is capped at the merges still wanted, but the
      // COLLECTED list stays batchK+1 wide — the sentinel fence must
      // reflect what exists, not what we want (a shrunken limit reads
      // as "full" and blinds the preMax = 0 fast path)
      val k = math.min(batchK, nMerges - r)
      // TakeOrderedAndProject: rows arrive in the Spark UTF8-binary
      // argmax order (no join to break it — a driver re-sort would
      // need BpeTrainer.Utf8Order, never Java String order)
      val rows = scoredPairs(words, minCount)
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(batchK + 1) // +1 sentinel: the hidden-pair score fence
        .collect()
        .map(x => Cand(x.getString(0), x.getString(1), x.getLong(2),
          x.getLong(3), x.getLong(4), x.getDouble(5)))
      actions += 1
      if (rows.isEmpty) done = true
      else {
        val full = rows.length == batchK + 1
        val tailScore = if (full) rows.last.score else 0.0
        val considered = rows.take(k)
        val accepted = Seq.newBuilder[Cand]
        var used = Set.empty[String]
        var fMax = 1.0
        var iMax = 1.0
        var stop = false
        var idx = 0 // == number accepted so far (the prefix property)
        while (idx < considered.length && !stop) {
          val c = considered(idx)
          val joined = c.l + stripCont(c.r)
          val safe =
            if (idx == 0) true // the true argmax, always safe
            else if (used.contains(c.l) || used.contains(c.r)) false
            else {
              // rows 0..idx-1 are accepted (consumed — score drops to
              // 0); threats live in the non-accepted remainder + the
              // sentinel + everything hidden below it
              val preMax = math.max(tailScore,
                rows.drop(idx + 1).iterator
                  .filter(q => used.contains(q.l) || used.contains(q.r))
                  .map(_.score).maxOption.getOrElse(0.0))
              preMax == 0.0 ||
                c.score > preMax * fMax * fMax * iMax * iMax * (1 + 1e-9)
            }
          if (!safe) stop = true
          else {
            accepted += c
            val collides = symsSuper.contains(joined) ||
              used.contains(joined) || c.l == c.r
            used = used + c.l + c.r + joined
            val denomL = c.lc - c.cnt
            val denomR = c.rc - c.cnt
            fMax = math.max(fMax,
              if (denomL <= 0 || denomR <= 0) Double.PositiveInfinity
              else math.max(c.lc.toDouble / denomL, c.rc.toDouble / denomR))
            iMax = math.max(iMax,
              2.0 * math.max(c.lc, c.rc).toDouble / c.cnt.toDouble)
            if (collides) stop = true
            idx += 1
          }
        }
        val acc = accepted.result()
        if (acc.isEmpty) done = true // cannot happen: argmax is safe
        else {
          var syms: Column = col("syms")
          acc.foreach { c =>
            syms = BpeTrainer.applyMerge(syms, c.l, c.r,
              c.l + stripCont(c.r))
          }
          acc.foreach { c =>
            merges += Merge(r, c.l, c.r, c.cnt, c.score); r += 1
            symsSuper = symsSuper + (c.l + stripCont(c.r))
          }
          words = words.withColumn("syms", syms).localCheckpoint()
          actions += 1
        }
      }
    }
    val ms = merges.result()
    val pieces = (alphabet ++ ms.map(m => m.left + stripCont(m.right)))
      .distinct
    val maxBody = if (pieces.isEmpty) 1
      else pieces.map(p => stripCont(p).length).max
    Model(ms, words, pieces, maxBody, actions)
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
    val w0 = initWords(df, textCol)
      .localCheckpoint(false) // cut the corpus scan off the loop plans
    val alphabet = w0.select(explode(col("syms")).as("sym"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    actions += 1
    var words = w0
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      // eager materialization of the round's lazy checkpoint BEFORE
      // the argmax plan reads it from three subtrees (pair counts +
      // uni joined twice): broadcast exchanges run as separate
      // concurrent driver jobs that would each re-run the fold
      // against a lazy cache (CLAUDE.md: the q_pca_power rule). One
      // vocab-sized count per round; round 1's is a cached re-read
      // (the alphabet collect already materialized w0)
      words.count()
      actions += 1
      val top = scoredPairs(words, minCount)
        .select(col("l"), col("r"), col("cnt"), col("score"))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1) // the argmax row — the only driver-sized collect
        .collect()
      actions += 1
      top.headOption match {
        case None => done = true
        case Some(row) =>
          val (l, rt) = (row.getString(0), row.getString(1))
          val cnt = row.getLong(2)
          merges += Merge(r, l, rt, cnt, row.getDouble(3))
          // WordPiece join: the continuation marker belongs to the
          // PIECE START, so `##i` merging onto `l` yields `li` (and
          // `##l`+`##i` yields `##li`) — strip it off the right side
          words = words
            .withColumn("syms", BpeTrainer.applyMerge(col("syms"), l, rt,
              l + stripCont(rt)))
            .localCheckpoint(false)
          r += 1
      }
    }
    val ms = merges.result()
    val pieces = (alphabet ++ ms.map(m => m.left + stripCont(m.right)))
      .distinct
    val maxBody = if (pieces.isEmpty) 1
      else pieces.map(p => stripCont(p).length).max
    Model(ms, words, pieces, maxBody, actions)
  }

  /** BERT-style greedy longest-match over a word: at position 0 only
    * bare pieces match, afterwards only continuation bodies; no match
    * anywhere collapses the WHOLE word to `[UNK]` (BERT's rule — a
    * partial emission would double-count the covered prefix).
    */
  private[graft] def greedy(w: String, bare: Set[String],
      cont: Set[String], maxBodyLen: Int): List[String] = {
    val out = List.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      var len = math.min(maxBodyLen, w.length - pos)
      var found: String = null
      while (len >= 1 && found == null) {
        val body = w.substring(pos, pos + len)
        if (pos == 0) { if (bare(body)) found = body }
        else if (cont(body)) found = "##" + body
        if (found == null) len -= 1
      }
      if (found == null) return List("[UNK]")
      out += found
      pos += len
    }
    out.result()
  }

  /** Segment a corpus with a trained model: greedy longest-match,
    * executor-parallel, inventory captured in the closure (bounded by
    * construction). Output: (idCol, word_pos, word, sub_pos, piece),
    * both positions 0-based longs — the [[BpeTrainer.segment]] /
    * [[UnigramLmTrainer.segment]] shape, so fertility/eval queries
    * compose over any of the three tokenizers unchanged.
    */
  def segment(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bare = model.pieces.filterNot(_.startsWith("##")).toSet
    val cont = model.pieces.filter(_.startsWith("##"))
      .map(_.substring(2)).toSet
    val maxBodyLen = math.max(1, model.maxBodyLen)
    df.select(expr(s"try_cast(`$idCol` AS BIGINT)").as("id"),
        posexplode(TextDedup.tokens(col(textCol)))
          .as(Seq("word_pos", "word")))
      // see CLAUDE.md: executor-lambda null guard + try_cast (ANSI
      // evaluates the projection before any filter could drop rows)
      .filter(col("id").isNotNull && length(col("word")) > 0)
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, wp, w) =>
          greedy(w, bare, cont, maxBodyLen).iterator.zipWithIndex
            .map { case (p, sp) => (id, wp.toLong, w, sp.toLong, p) }
        }
      }.toDF("id", "word_pos", "word", "sub_pos", "piece")
      .withColumnRenamed("id", idCol)
  }
}
