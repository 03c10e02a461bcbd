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
    * vocab). `maxBodyLen` bounds the greedy lookahead.
    */
  final case class Model(
      merges: Seq[Merge],
      vocab: DataFrame /* word, n, syms (post-merge marked split) */,
      pieces: Seq[String],
      maxBodyLen: Int)

  private[graft] def stripCont(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** Continuation-marked character split: first char bare, the rest
    * `##`-prefixed — the symbol alphabet WordPiece trains over.
    */
  private def markedSplit(word: Column): Column =
    transform(BpeTrainer.charSplit(word),
      (x, i) => when(i === 0, x).otherwise(concat(lit("##"), x)))

  /** Train up to `nMerges` likelihood-scored merges over the
    * whitespace words of `df.textCol`; a round stops early when no
    * remaining pair has weighted count >= `minCount`.
    */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      nMerges: Int,
      minCount: Long = 2L): Model = {
    require(nMerges >= 0 && minCount >= 1,
      s"need nMerges >= 0 and minCount >= 1, got $nMerges / $minCount")
    val w0 = df
      .select(explode(TextDedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", markedSplit(col("word")))
      .localCheckpoint(false) // cut the corpus scan off the loop plans
    // the alphabet collect is bounded by the charset (distinct marked
    // single characters), never by the corpus
    val alphabet = w0.select(explode(col("syms")).as("sym"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
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
      val uni = words.select(col("n"), explode(col("syms")).as("sym"))
        .groupBy("sym").agg(sum(col("n")).as("uc"))
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= minCount)
        .join(uni.select(col("sym").as("l"), col("uc").as("lc")), "l")
        .join(uni.select(col("sym").as("r"), col("uc").as("rc")), "r")
        // fixed association cnt / (lc · rc) — mirrored verbatim in
        // the oracle's unrolled rounds
        .withColumn("score", col("cnt").cast("double") /
          (col("lc").cast("double") * col("rc").cast("double")))
        // pin the column order before collect — the keyed joins moved
        // the join keys to the front
        .select(col("l"), col("r"), col("cnt"), col("score"))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1) // the argmax row — the only driver-sized collect
        .collect()
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
    Model(ms, words, pieces, maxBody)
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
