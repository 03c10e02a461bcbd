package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WordPieceTrainer

/** WordPiece trainer + greedy server against an independent
  * driver-side reference (plain Scala maps/folds, no Spark) — the
  * BpeTrainerSpec pattern — plus the greedy-serving invariants the
  * hash gate alone can't articulate (marking, reassembly, UNK).
  */
class WordPieceSpec extends AnyFunSuite with PropHelpers {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // --- reference implementation (plain Scala, no Spark) ---

  private def strip(s: String) =
    if (s.startsWith("##")) s.substring(2) else s

  private def markedSplit(w: String): Vector[String] =
    w.split("").filter(_.nonEmpty).toVector match {
      case h +: t => h +: t.map("##" + _)
      case e => e
    }

  private def refApply(
      syms: Vector[String], l: String, r: String): Vector[String] = {
    val joined = l + strip(r)
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        b += joined; i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  private def refTrain(
      wordCounts: Map[String, Long],
      nMerges: Int,
      minCount: Long): Seq[(String, String, Long, Double)] = {
    var vocab = wordCounts.toVector.map { case (w, c) =>
      (markedSplit(w), c)
    }
    val out = Seq.newBuilder[(String, String, Long, Double)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      val uc = scala.collection.mutable.Map.empty[String, Long]
      vocab.foreach { case (syms, c) =>
        syms.foreach(s => uc(s) = uc.getOrElse(s, 0L) + c)
        syms.zip(syms.drop(1)).foreach { p =>
          pc(p) = pc.getOrElse(p, 0L) + c
        }
      }
      val cands = pc.filter(_._2 >= minCount).toVector.map {
        case ((l, rr), cnt) =>
          (l, rr, cnt, cnt.toDouble / (uc(l).toDouble * uc(rr).toDouble))
      }
      if (cands.isEmpty) done = true
      else {
        val (l, rr, cnt, sc) = cands.minBy { case (l, rr, _, sc) =>
          (-sc, l, rr) // score desc, then pair text asc
        }
        out += ((l, rr, cnt, sc))
        vocab = vocab.map { case (syms, c) => (refApply(syms, l, rr), c) }
        r += 1
      }
    }
    out.result()
  }

  private def wordCountsOf(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.trim.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }

  test("trainMerges matches the reference on a hand corpus") {
    import spark.implicits._
    val docs = Seq("low low lower lowest", "new newer newest new",
      "aaaaa aaaaa", "low new").toDF("text")
    val texts = Seq("low low lower lowest", "new newer newest new",
      "aaaaa aaaaa", "low new")
    val expected = refTrain(wordCountsOf(texts), nMerges = 10,
      minCount = 2)
    val got = WordPieceTrainer.trainMerges(docs, "text", nMerges = 10)
      .merges.map(m => (m.left, m.right, m.count, m.score))
    assert(got == expected)
    // every right side is a continuation symbol by construction
    assert(got.forall(_._2.startsWith("##")))
  }

  test("trainMerges matches the reference on the real documents table") {
    val docs = Tables.table(spark, dir, "documents")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val expected = refTrain(wordCountsOf(texts), nMerges = 8,
      minCount = 2)
    val model = WordPieceTrainer.trainMerges(docs, "text", nMerges = 8)
    assert(model.merges.map(m =>
      (m.left, m.right, m.count, m.score)) == expected)
    // the inventory carries the alphabet plus one piece per merge
    expected.foreach { case (l, r, _, _) =>
      assert(model.pieces.contains(l + strip(r)))
    }
  }

  test("greedy serving: marking, reassembly, longest-match, UNK") {
    val bare = Set("un", "affable", "a", "b", "x")
    val cont = Set("affable", "able", "a", "b")
    // longest match wins: "unaffable" → un ##affable (not ##a…)
    assert(WordPieceTrainer.greedy("unaffable", bare, cont, 10) ==
      List("un", "##affable"))
    // continuation vs initial inventories are position-gated:
    // "affable" is bare too, so alone it is one piece
    assert(WordPieceTrainer.greedy("affable", bare, cont, 10) ==
      List("affable"))
    // uncoverable ANYWHERE collapses the whole word (BERT rule)
    assert(WordPieceTrainer.greedy("unz", bare, cont, 10) ==
      List("[UNK]"))
    assert(WordPieceTrainer.greedy("zab", bare, cont, 10) ==
      List("[UNK]"))
    // reassembly: concat of stripped pieces == word when covered
    val covered = WordPieceTrainer.greedy("abab", bare, cont, 10)
    assert(covered.map(strip).mkString == "abab")
  }

  test("greedy fuzz: cover-or-UNK, marking discipline, max-munch") {
    val gen = for {
      alpha <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
      pieces <- Gen.listOfN(6,
        Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c")).map(_.mkString))
      w <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
        .map(_.mkString)
    } yield (alpha.toSet ++ pieces, w)
    forAll(gen, n = 80) { case (inv, w) =>
      val bare = inv
      val cont = inv.map(p => p: String)
      val out = WordPieceTrainer.greedy(w, bare, cont,
        inv.map(_.length).max)
      if (out == List("[UNK]")) {
        // independent replay: the max-munch scan must also fail
        var pos = 0
        var stuck = false
        while (!stuck && pos < w.length) {
          val hit = (math.min(inv.map(_.length).max, w.length - pos)
            to 1 by -1)
            .find(l => inv.contains(w.substring(pos, pos + l)))
          hit match {
            case Some(l) => pos += l
            case None => stuck = true
          }
        }
        assert(stuck, s"greedy said UNK but replay covers $w")
      } else {
        // pieces reassemble exactly; first bare, rest marked
        assert(out.head == strip(out.head))
        assert(out.tail.forall(_.startsWith("##")))
        assert(out.map(strip).mkString == w)
        // max-munch: each piece is the longest inventory match at its
        // position (replay the scan independently)
        var pos = 0
        out.foreach { p =>
          val body = strip(p)
          val longer = ((body.length + 1) to (w.length - pos)).exists {
            L => inv.contains(w.substring(pos, pos + L))
          }
          assert(!longer, s"$p not max-munch in $w at $pos")
          pos += body.length
        }
      }
    }
  }

  test("batched trainMerges equals sequential under fuzz (score ties, " +
      "shared symbols, tiny batches)") {
    // the score-domain batch guards (denominator-shrinkage F, new-pair
    // inheritance I, preMax fence) must NEVER change the sequence —
    // random tiny corpora maximize shared symbols, consumed unigram
    // counts (F unbounded) and score ties; batchK=3 forces boundaries.
    import spark.implicits._
    import org.scalacheck.Gen
    val genWord = for {
      len <- Gen.choose(1, 5)
      cs <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield cs.mkString
    val genCorpus = for {
      n <- Gen.choose(3, 10)
      ws <- Gen.listOfN(n, genWord)
      reps <- Gen.listOfN(n, Gen.choose(1, 4))
      mc <- Gen.oneOf(1L, 2L)
    } yield (ws.zip(reps).map { case (w, k) =>
      Seq.fill(k)(w).mkString(" ") }, mc)
    forAll(genCorpus, n = 15) { case (docs, mc) =>
      val df = docs.toDF("text")
      val batched = WordPieceTrainer.trainMerges(df, "text", nMerges = 8,
        minCount = mc, batchK = 3)
      val seq = WordPieceTrainer.trainMergesSequential(df, "text",
        nMerges = 8, minCount = mc)
      assert(batched.merges == seq.merges,
        s"docs=$docs mc=$mc\nbatched=${batched.merges}\nseq=${seq.merges}")
      assert(batched.pieces.sorted == seq.pieces.sorted)
      assert(batched.maxBodyLen == seq.maxBodyLen)
      def vocabOf(m: WordPieceTrainer.Model) =
        m.vocab.select("word", "n", "syms").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
          .sortBy(_._1).toSeq
      assert(vocabOf(batched) == vocabOf(seq))
    }
  }

  test("score ties over supplementary-plane symbols follow Spark's " +
      "UTF8 binary order, not Java's") {
    // same trap as the BpeTrainerSpec twin: the driver re-sort of the
    // collected candidates must use UTF8 byte order (Utf8Order), where
    // U+E000 < U+10000, not Java's UTF-16 code-unit order, where the
    // surrogate pair ranks first — a score tie would otherwise pick a
    // different argmax than trainMergesSequential's Spark orderBy.
    import spark.implicits._
    val e = "\uE000"      // BMP private-use, UTF-8 EE 80 80
    val s = "\uD800\uDC00" // U+10000, UTF-8 F0 90 80 80
    val docs = Seq(s"${e}b ${e}b ${s}b ${s}b").toDF("text")
    val batched = WordPieceTrainer.trainMerges(docs, "text", nMerges = 2,
      minCount = 2, batchK = 4)
    val seq = WordPieceTrainer.trainMergesSequential(docs, "text",
      nMerges = 2, minCount = 2)
    assert(batched.merges == seq.merges)
    assert(batched.merges.head.left == e, batched.merges.toString)
  }

  test("batched trainMerges needs >= 5x fewer driver actions at " +
      "nMerges = 50") {
    // WordPiece batches are intrinsically smaller than BPE's (real
    // merges chain on fresh joined symbols), but the no-touched-pairs
    // fast path must still collapse an embarrassingly-parallel merge
    // set — disjoint 2-char words whose pairs cannot interact — into
    // a handful of driver actions. batchK must cover the full pair
    // list (the preMax = 0 proof needs every pair visible).
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      val w = s"${(0x41 + i).toChar}${(0xC0 + i).toChar}"
      Seq.fill(600 - 10 * i)(w).mkString(" ")
    }.toDF("text")
    val batched = WordPieceTrainer.trainMerges(docs, "text", nMerges = 50,
      minCount = 2, batchK = 64)
    val seq = WordPieceTrainer.trainMergesSequential(docs, "text",
      nMerges = 50, minCount = 2)
    assert(batched.merges == seq.merges)
    assert(batched.merges.size == 50)
    assert(batched.actions * 5 <= seq.actions,
      s"batched=${batched.actions} actions vs sequential=${seq.actions}")
  }

  test("segment output composes like the other tokenizers") {
    val d = Tables.table(spark, dir, "documents")
    val model = WordPieceTrainer.trainMerges(
      d.filter(col("doc_id") < 200), "text", nMerges = 8)
    val seg = WordPieceTrainer.segment(
      d.filter(col("doc_id") < 50), "doc_id", "text", model)
    // reassembly per (doc, word): stripped pieces concat to the word
    // (collect_list is unordered — sort by sub_pos before concat)
    val badRe = seg.groupBy("doc_id", "word_pos", "word")
      .agg(sort_array(collect_list(
        struct(col("sub_pos"), col("piece")))).as("sp"))
      .withColumn("ps", expr("transform(sp, x -> x.piece)"))
      .withColumn("re", concat_ws("",
        expr("transform(ps, p -> regexp_replace(p, '^##', ''))")))
      .filter(col("re") =!= col("word") &&
        !array_contains(col("ps"), "[UNK]"))
      .count()
    assert(badRe == 0)
    // sub positions are dense from 0 per word
    val badPos = seg.groupBy("doc_id", "word_pos")
      .agg(min("sub_pos").as("mn"), max("sub_pos").as("mx"),
        count(lit(1)).as("c"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("c") - 1)
      .count()
    assert(badPos == 0)
  }
}
