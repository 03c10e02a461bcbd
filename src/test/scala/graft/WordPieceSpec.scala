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
