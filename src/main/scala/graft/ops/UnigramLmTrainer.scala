package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed unigram-language-model tokenizer training — the
  * SentencePiece algorithm (Kudo, ACL 2018), the second public
  * tokenizer-training algorithm an LLM-data platform runs beside
  * [[BpeTrainer]]'s BPE.
  *
  * The classic shape: seed a large candidate vocabulary (frequent
  * substrings + the corpus alphabet), then EM — segment every word
  * under the current piece probabilities, re-estimate probabilities
  * from the segmentation counts — and finally prune to the target
  * vocabulary. This implementation uses hard (Viterbi) EM: each
  * E-step assigns every word its single best segmentation; SentencePiece's
  * forward–backward soft counts refine the same fixed point.
  *
  * Scale stance (the [[BpeTrainer]] contract): the corpus is scanned
  * ONCE into the vocabulary-sized (word, n) frame; every EM round is
  * one executor-parallel `mapPartitions` Viterbi pass over that frame
  * plus one piece-count aggregate. The piece table itself is bounded
  * by construction — `seedSize` and `maxAlphabet` are LIMIT literals —
  * so it rides to executors inside the task closure and the per-round
  * aggregate collect is ≤ |pieces| rows (the 16-row-quantizer rule).
  * A 100 TB corpus pays the one corpus scan; rounds cost |vocab|.
  *
  * Coverage: the alphabet seed is capped at `maxAlphabet` most-frequent
  * single characters (SentencePiece's `character_coverage < 1.0`
  * semantics) — words containing an uncovered character have no
  * segmentation and are skipped in counting, never crash the pass.
  * Alphabet pieces are floored at count 1 through EM so coverage
  * cannot silently erode between rounds.
  *
  * Gate: the declared `q_unigram_lm` is rows-only (EM over doubles is
  * not SQL-expressible cross-engine); exactness is pinned by
  * `UnigramLmSpec` against an independent driver-side reference
  * implementation, the `q_bpe_merges`/BpeTrainerSpec pattern.
  */
object UnigramLmTrainer {

  /** One vocabulary piece: training count under the final E-step and
    * its log probability; `rank` orders by (count DESC, piece).
    */
  final case class Piece(rank: Int, piece: String, count: Long,
      logProb: Double)

  final case class Model(pieces: Seq[Piece]) {
    def logProbs: Map[String, Double] =
      pieces.iterator.map(p => p.piece -> p.logProb).toMap
    def maxPieceLen: Int =
      if (pieces.isEmpty) 0 else pieces.iterator.map(_.piece.length).max
  }

  /** Single best (Viterbi) segmentation of `word` under `lp` piece
    * log-probabilities; None if some position is uncoverable. Ties
    * break deterministically: higher score, then FEWER pieces, then
    * the longer last piece (smaller split point).
    */
  private[graft] def viterbi(word: String, lp: Map[String, Double],
      maxLen: Int): Option[List[String]] = {
    val n = word.length
    if (n == 0) return Some(Nil)
    // per position: (score, pieces, backpointer); -1 marks unreachable
    val score = new Array[Double](n + 1)
    val count = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(back, -1)
    score(0) = 0.0
    count(0) = 0
    back(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (back(j) >= 0) {
          lp.get(word.substring(j, i)) match {
            case Some(l) =>
              val s = score(j) + l
              val c = count(j) + 1
              val better = back(i) < 0 || s > score(i) ||
                (s == score(i) && (c < count(i) ||
                  (c == count(i) && j < back(i))))
              if (better) { score(i) = s; count(i) = c; back(i) = j }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    if (back(n) < 0) None
    else {
      var out = List.empty[String]
      var pos = n
      while (pos > 0) {
        val j = back(pos)
        out = word.substring(j, pos) :: out
        pos = j
      }
      Some(out)
    }
  }

  /** Train a unigram-LM vocabulary of `vocabSize` pieces over the
    * space-separated words of `df.textCol` (the repo-wide
    * [[TextDedup.tokens]] semantics: split on spaces after a
    * space-trim; other whitespace rides inside tokens). The whole
    * alphabet always survives pruning (SentencePiece's
    * required-characters rule), so the returned vocabulary EXCEEDS
    * `vocabSize` when the corpus has more distinct characters than
    * the target — the caller's size budget must account for the
    * alphabet. `maxPieceLen`, seeding windows, and the alphabet/multi
    * split count CODE POINTS (a surrogate pair is one character); the
    * Viterbi window internally adapts to the longest live piece's
    * code-UNIT length.
    */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      seedSize: Int = 200,
      maxPieceLen: Int = 4,
      emIters: Int = 3,
      maxAlphabet: Int = 1000): Model = {
    require(vocabSize >= 1 && seedSize >= 1 && maxPieceLen >= 1 &&
      emIters >= 1 && maxAlphabet >= 1,
      s"need positive vocabSize/seedSize/maxPieceLen/emIters/" +
        s"maxAlphabet, got $vocabSize/$seedSize/$maxPieceLen/" +
        s"$emIters/$maxAlphabet")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(TextDedup.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // cut the corpus scan off the round plans
      .as[(String, Long)]
    // seed candidates: every CODE-POINT substring of length
    // 1..maxPieceLen of every distinct word, weighted by word
    // frequency — one flatMap + aggregate over the VOCABULARY frame,
    // map-side combined. Code-POINT windows (boundaries never split a
    // surrogate pair): a UTF-16-indexed seeding emitted lone
    // surrogates, which UTF8String silently encodes as '?' — distinct
    // characters conflated into one phantom piece — and classified a
    // supplementary-plane character as "multi" by SQL length while
    // the matcher measured code units. The `cp` column (the piece's
    // code-point count, intrinsic to the string) drives the
    // alphabet/multi split below.
    val mplSeed = maxPieceLen
    // a LOCAL handle, released after the two seed collects: unlike
    // the declared-query ops, train() consumes its cache entirely
    // inside this call, so nothing needs to outlive it in the ledger
    val seedCache = new CacheHandle
    val subs = seedCache.persist(words.flatMap { case (w, n) =>
      // code-point boundary indices into the UTF-16 string
      val bnd = {
        val b = Array.newBuilder[Int]
        var i = 0
        b += 0
        while (i < w.length) {
          i += Character.charCount(w.codePointAt(i)); b += i
        }
        b.result()
      }
      for {
        a <- 0 until bnd.length - 1
        k <- 1 to math.min(mplSeed, bnd.length - 1 - a)
      } yield (w.substring(bnd(a), bnd(a + k)), n, k)
    }.toDF("piece", "n", "cp")
      .groupBy("piece").agg(sum(col("n")).as("cnt"),
        max(col("cp")).as("cp")))
    // both collects bounded by LIMIT literals (seedSize / maxAlphabet)
    val alphabet = subs.filter(col("cp") === 1)
      .select(col("piece"), col("cnt"))
      .orderBy(col("cnt").desc, col("piece")).limit(maxAlphabet)
      .as[(String, Long)].collect()
    val multiSeed = subs.filter(col("cp") > 1)
      .select(col("piece"), col("cnt"))
      .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
      .as[(String, Long)].collect()
    seedCache.release()
    val alphaSet = alphabet.iterator.map(_._1).toSet
    var counts: Map[String, Long] = (alphabet ++ multiSeed).toMap

    var round = 0
    while (round < emIters) {
      val total = counts.valuesIterator.sum.toDouble
      val lp = counts.map { case (p, c) => p -> math.log(c / total) }
      // the DP window slides in CODE UNITS: size it to the longest
      // live piece's code-unit length (a maxPieceLen-code-point piece
      // of supplementary-plane characters spans 2x the units)
      val mpl = counts.keysIterator.map(_.length).maxOption.getOrElse(1)
      // E-step: one distributed Viterbi pass over the word frame; the
      // lp map is closure-shipped (bounded: seedSize + maxAlphabet)
      val stepCounts = words.mapPartitions { it =>
        it.flatMap { case (w, n) =>
          viterbi(w, lp, mpl) match {
            case Some(segs) => segs.iterator.map(p => (p, n))
            case None => Iterator.empty // uncovered character: skip
          }
        }
      }.toDF("piece", "n")
        .groupBy("piece").agg(sum(col("n")).as("cnt"))
        .as[(String, Long)]
        .collect() // ≤ |pieces| rows — bounded by the seed literals
        .toMap
      // M-step: winners keep their counts; unused multi-char pieces
      // drop out; the alphabet is floored at 1 so coverage holds
      counts = counts.flatMap { case (p, _) =>
        stepCounts.get(p) match {
          case Some(c) => Some(p -> c)
          case None if alphaSet(p) => Some(p -> 1L)
          case None => None
        }
      }
      round += 1
    }

    // prune to the target size: the whole alphabet survives (coverage),
    // multi-char pieces compete for the remainder by (count, piece)
    val (alphaFinal, multiFinal) = counts.toSeq.partition(p => alphaSet(p._1))
    val keepMulti = multiFinal
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - alphaFinal.size))
    val kept = (alphaFinal ++ keepMulti).sortBy { case (p, c) => (-c, p) }
    val total = kept.iterator.map(_._2).sum.toDouble
    Model(kept.zipWithIndex.map { case ((p, c), i) =>
      Piece(i, p, c, math.log(c / total))
    })
  }

  /** One piece per Unicode CODE POINT, surrogate pairs kept intact —
    * the lossless per-character split for the OOV fallback.
    */
  private def codePointPieces(w: String): List[String] = {
    val b = List.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      b += w.substring(i, i + n)
      i += n
    }
    b.result()
  }

  /** Segment a corpus with a trained model: Viterbi under the final
    * piece log-probabilities, executor-parallel; words with uncovered
    * characters fall back to per-character pieces with null-handled
    * absence semantics — they emit their raw characters so downstream
    * token counting stays total. Output: (idCol, word_pos, word,
    * sub_pos, piece), positions 0-based longs.
    */
  def segment(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lp = model.logProbs
    val mpl = math.max(1, model.maxPieceLen)
    df.select(expr(s"try_cast(`$idCol` AS BIGINT)").as("id"),
        posexplode(TextDedup.tokens(col(textCol)))
          .as(Seq("word_pos", "word")))
      // a null id would NPE the primitive-Long decode inside the
      // task — the executor-lambda null rule — and under ANSI a plain
      // cast of a NON-castable id THROWS in the projection before any
      // filter could drop the row (the guard-at-the-producing-
      // projection rule): try_cast makes both shapes a dropped row
      .filter(col("id").isNotNull && length(col("word")) > 0)
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, wp, w) =>
          // OOV fallback splits by CODE POINT, not UTF-16 code unit:
          // per-char split of a supplementary-plane character emits
          // lone surrogates, which UTF8String encodes as '?' —
          // reassembly would be lossy (the same corruption class the
          // train()-side code-point seeding avoids)
          val pieces = viterbi(w, lp, mpl)
            .getOrElse(codePointPieces(w))
          pieces.iterator.zipWithIndex.map { case (p, sp) =>
            (id, wp.toLong, w, sp.toLong, p)
          }
        }
      }.toDF("id", "word_pos", "word", "sub_pos", "piece")
      .withColumnRenamed("id", idCol)
  }
}
