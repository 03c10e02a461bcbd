package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UnigramLmTrainer

/** Pins the distributed unigram-LM trainer against an INDEPENDENT
  * driver-side reference (the BpeTrainerSpec pattern): the reference
  * segments by EXHAUSTIVE enumeration (the trainer uses DP/Viterbi)
  * and runs the same seed → hard-EM → prune loop over plain
  * collections. Exact (rank, piece, count) equality is asserted.
  */
class UnigramLmSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // ---- independent reference -------------------------------------

  /** Every segmentation of `w` into vocab pieces of length <= maxLen,
    * each with its left-to-right score sum (the same association the
    * DP uses, so score ties are EXACT double equality).
    */
  private def allSegs(w: String, lp: Map[String, Double], maxLen: Int)
      : List[(List[String], Double, List[Int])] = {
    if (w.isEmpty) return List((Nil, 0.0, Nil))
    (1 to math.min(maxLen, w.length)).toList.flatMap { k =>
      val head = w.substring(0, k)
      lp.get(head) match {
        case None => Nil
        case Some(l) =>
          allSegs(w.substring(k), lp, maxLen).map { case (segs, s, cuts) =>
            (head :: segs, l + s, k :: cuts.map(_ + k))
          }
      }
    }
  } // score association: rebuilt left-to-right below

  private def refBest(w: String, lp: Map[String, Double], maxLen: Int)
      : Option[List[String]] = {
    val cands = allSegs(w, lp, maxLen).map { case (segs, _, cuts) =>
      // recompute the score strictly left-to-right (the DP's order)
      val s = segs.foldLeft(0.0)((acc, p) => acc + lp(p))
      (segs, s, cuts)
    }
    if (cands.isEmpty) None
    else {
      val maxScore = cands.map(_._2).max
      val top = cands.filter(_._2 == maxScore)
      val minCount = top.map(_._1.length).min
      // the DP prefers, at every position from the END, the smaller
      // split point: lexicographic ascending on the REVERSED cut list
      implicit val ord: Ordering[List[Int]] =
        (a: List[Int], b: List[Int]) => {
          val ar = a.reverse; val br = b.reverse
          ar.zip(br).find { case (x, y) => x != y }
            .map { case (x, y) => x.compare(y) }
            .getOrElse(ar.length.compare(br.length))
        }
      Some(top.filter(_._1.length == minCount).minBy(_._3)._1)
    }
  }

  private def refTrain(
      wordFreqs: Seq[(String, Long)],
      vocabSize: Int, seedSize: Int, maxLen: Int, iters: Int,
      maxAlphabet: Int): Seq[(Int, String, Long)] = {
    val subCnt = collection.mutable.Map.empty[String, Long]
    // code-POINT windows, built independently of the trainer's
    // boundary walk: materialize the code-point array and re-encode
    wordFreqs.foreach { case (w, n) =>
      val cps = w.codePoints().toArray
      for (i <- cps.indices;
           k <- 1 to math.min(maxLen, cps.length - i))
        subCnt.updateWith(new String(cps, i, k)) {
          c => Some(c.getOrElse(0L) + n)
        }
    }
    def cpLen(p: String): Int = p.codePointCount(0, p.length)
    val alpha = subCnt.filter(e => cpLen(e._1) == 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(maxAlphabet)
    val alphaSet = alpha.map(_._1).toSet
    val multi = subCnt.filter(e => cpLen(e._1) > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var counts = (alpha ++ multi).toMap
    (1 to iters).foreach { _ =>
      val total = counts.values.sum.toDouble
      val lp = counts.map { case (p, c) => p -> math.log(c / total) }
      // the segmentation window is the longest live piece's
      // code-UNIT length, like the trainer
      val window = counts.keysIterator.map(_.length).maxOption.getOrElse(1)
      val step = collection.mutable.Map.empty[String, Long]
      wordFreqs.foreach { case (w, n) =>
        refBest(w, lp, window).foreach(_.foreach(p =>
          step.updateWith(p)(c => Some(c.getOrElse(0L) + n))))
      }
      counts = counts.flatMap { case (p, _) =>
        step.get(p) match {
          case Some(c) => Some(p -> c)
          case None if alphaSet(p) => Some(p -> 1L)
          case None => None
        }
      }
    }
    val (af, mf) = counts.toSeq.partition(e => alphaSet(e._1))
    val keep = (af ++ mf.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - af.size)))
      .sortBy { case (p, c) => (-c, p) }
    keep.zipWithIndex.map { case ((p, c), i) => (i, p, c) }
  }

  // ---- parity ------------------------------------------------------

  private def corpusDF(texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("text")
  }

  // the trainer tokenizes with TextDedup.tokens = split(trim, " "):
  // single SPACES only (other whitespace rides inside tokens) — the
  // reference must count words identically
  private def wordFreqs(texts: Seq[String]): Seq[(String, Long)] =
    texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq

  test("trainer matches the exhaustive-reference EM exactly on a repeated-bigram corpus") {
    val texts = Seq(
      "ababab abab banana bandana", "ababab cabbage banana",
      "abab abc cabbage ban", "banana band ban abc")
    val got = UnigramLmTrainer.train(corpusDF(texts), "text",
      vocabSize = 12, seedSize = 20, maxPieceLen = 3, emIters = 3)
      .pieces.map(p => (p.rank, p.piece, p.count))
    val want = refTrain(wordFreqs(texts), 12, 20, 3, 3, 1000)
    assert(got == want)
    // the dominant bigram must be learned as a piece
    assert(got.exists { case (_, p, _) => p == "ab" || p == "aba" })
  }

  test("trainer matches the reference on a corpus with EM-pruned multi-char pieces") {
    val texts = Seq("xxxx yyyy xy", "xxxx zz zz xy", "yyyy zz xyz")
    val got = UnigramLmTrainer.train(corpusDF(texts), "text",
      vocabSize = 8, seedSize = 10, maxPieceLen = 2, emIters = 4)
      .pieces.map(p => (p.rank, p.piece, p.count))
    val want = refTrain(wordFreqs(texts), 8, 10, 2, 4, 1000)
    assert(got == want)
    // the whole alphabet survives pruning (coverage invariant)
    val pieces = got.map(_._2).toSet
    assert(Set("x", "y", "z").subsetOf(pieces))
  }

  test("non-BMP corpora: surrogate pairs stay whole, parity holds, no phantom '?' pieces") {
    // U+1D11E (musical G clef) is 2 UTF-16 code units: a code-unit
    // seeding emitted lone surrogates (silently '?' in UTF8String)
    // and classified the character as a MULTI piece while the
    // reference called it alphabet — the r14 review finding
    val clef = new String(Character.toChars(0x1D11E))
    val texts = Seq(s"$clef$clef ab$clef ab", s"ab $clef$clef$clef x",
      s"x$clef ab")
    val got = UnigramLmTrainer.train(corpusDF(texts), "text",
      vocabSize = 10, seedSize = 12, maxPieceLen = 2, emIters = 3)
      .pieces.map(p => (p.rank, p.piece, p.count))
    val want = refTrain(wordFreqs(texts), 10, 12, 2, 3, 1000)
    assert(got == want)
    val pieces = got.map(_._2)
    assert(pieces.contains(clef)) // one CODE POINT -> alphabet piece
    assert(!pieces.exists(_.contains("?")))
    assert(!pieces.exists(p => Character.isHighSurrogate(p.last) ||
      Character.isLowSurrogate(p.head))) // no broken pairs ever seeded
  }

  test("viterbi equals exhaustive search: score, piece count, and tie chain") {
    // scores chosen so max-score ties are COMMON (ab/ba both -2.0,
    // chains of a/b vs pair pieces collide) — the tie chain is the
    // part worth pinning against the exhaustive order
    val lp = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -2.0, "ba" -> -2.0,
      "bb" -> -4.0, "abb" -> -5.5, "aa" -> -6.0)
    for (w <- Seq("ababab", "abba", "babab", "aabb", "bbbb", "a", "")) {
      assert(UnigramLmTrainer.viterbi(w, lp, 3) == refBest(w, lp, 3),
        s"word=$w")
    }
    // uncovered character: no segmentation, never a crash
    assert(UnigramLmTrainer.viterbi("abq", lp, 3) == None)
  }

  test("segment: OOV characters fall back to raw per-character pieces") {
    import spark.implicits._
    val m = UnigramLmTrainer.train(
      corpusDF(Seq("aa bb aa")), "text",
      vocabSize = 4, seedSize = 4, maxPieceLen = 2, emIters = 1)
    val out = UnigramLmTrainer.segment(
      Seq((1L, "aa qq")).toDF("id", "text"), "id", "text", m)
      .orderBy("word_pos", "sub_pos")
      .select("word", "piece").as[(String, String)].collect()
    assert(out.filter(_._1 == "aa").map(_._2).mkString == "aa")
    // 'q' is not in the trained alphabet: raw characters, still total
    assert(out.filter(_._1 == "qq").map(_._2).toSeq == Seq("q", "q"))
  }

  test("segment: OOV fallback splits by code point — no lone surrogates") {
    import spark.implicits._
    // U+1D11E is 2 UTF-16 units and NOT in the trained alphabet: a
    // code-unit fallback would emit two lone-surrogate pieces (each
    // silently '?' in UTF8String) — reassembly must be lossless
    val clef = new String(Character.toChars(0x1D11E))
    val m = UnigramLmTrainer.train(
      corpusDF(Seq("aa bb aa")), "text",
      vocabSize = 4, seedSize = 4, maxPieceLen = 2, emIters = 1)
    val out = UnigramLmTrainer.segment(
      Seq((1L, s"a$clef${clef}q")).toDF("id", "text"), "id", "text", m)
      .orderBy("word_pos", "sub_pos")
      .select("piece").as[String].collect().toSeq
    assert(out == Seq("a", clef, clef, "q"))
    assert(out.mkString == s"a$clef${clef}q") // lossless reassembly
    assert(!out.exists(_.contains("?")))
  }

  test("segment drops null-id rows instead of crashing the decode") {
    import spark.implicits._
    val m = UnigramLmTrainer.train(
      corpusDF(Seq("aa bb")), "text",
      vocabSize = 4, seedSize = 4, maxPieceLen = 2, emIters = 1)
    val rows = UnigramLmTrainer.segment(
      Seq((Option(1L), "aa"), (Option.empty[Long], "aa"))
        .toDF("id", "text"), "id", "text", m)
      .select("id").as[Long].collect()
    assert(rows.nonEmpty && rows.forall(_ == 1L))
  }
}
