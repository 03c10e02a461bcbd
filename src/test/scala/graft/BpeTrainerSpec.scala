package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BpeTrainer

/** The BPE trainer's correctness gate: q_bpe_merges / q_bpe_segment
  * are rows-only at the driver (no single-SQL oracle exists for an
  * iterative data-dependent merge sequence), so this spec carries the
  * cross-check — an independent driver-side reference implementation
  * run over the SAME inputs, including the real documents table.
  */
class BpeTrainerSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // --- reference implementation (plain Scala, no Spark) ---

  private def refApply(
      syms: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  private def refTrain(
      wordCounts: Map[String, Long],
      nMerges: Int,
      minCount: Long): Seq[(String, String, Long)] = {
    var vocab = wordCounts.toVector.map { case (w, c) =>
      (w.split("").filter(_.nonEmpty).toVector, c)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rr), cnt) = counts.minBy { case ((l, rr), c) =>
          (-c, l, rr) // count desc, then pair text asc — the argmax rule
        }
        if (cnt < minCount) done = true
        else {
          out += ((l, rr, cnt))
          vocab = vocab.map { case (syms, c) => (refApply(syms, l, rr), c) }
          r += 1
        }
      }
    }
    out.result()
  }

  test("trainMerges matches the reference on a hand corpus (incl. runs)") {
    import spark.implicits._
    // "aaaaa" exercises the left-to-right non-overlap rule on runs
    val docs = Seq("low low lower lowest", "new newer newest new",
      "aaaaa aaaaa", "low new").toDF("text")
    val words = docs
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .collect().map(_.getString(0)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val expected = refTrain(words, nMerges = 10, minCount = 2)
    val got = BpeTrainer.trainMerges(docs, "text", nMerges = 10)
      .merges.map(m => (m.left, m.right, m.count))
    assert(got == expected)
    // choice counts never increase round over round (argmax property)
    val cnts = got.map(_._3)
    assert(cnts.zip(cnts.drop(1)).forall { case (a, b) => a >= b })
  }

  test("trainMerges matches the reference on the real documents table") {
    val docs = Tables.table(spark, dir, "documents")
    val words = docs
      .select(explode(graft.ops.TextDedup.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refTrain(words, nMerges = 12, minCount = 2)
    val got = BpeTrainer.trainMerges(docs, "text", nMerges = 12)
      .merges.map(m => (m.left, m.right, m.count))
    assert(got == expected)
  }

  test("batched trainMerges equals sequential under fuzz (ties, runs, " +
      "tiny batches)") {
    // the batch guards (count gap, equal-count-touched, collision and
    // l==r stops) are easy to get wrong exactly where random tiny
    // corpora live: massive count ties, overlapping symbols, self
    // pairs. batchK=3 forces many batch boundaries.
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
    forAllProp(genCorpus, n = 15) { case (docs, mc) =>
      val df = docs.toDF("text")
      val batched = BpeTrainer.trainMerges(df, "text", nMerges = 8,
        minCount = mc, batchK = 3)
      val seq = BpeTrainer.trainMergesSequential(df, "text", nMerges = 8,
        minCount = mc)
      assert(batched.merges == seq.merges,
        s"docs=$docs mc=$mc\nbatched=${batched.merges}\nseq=${seq.merges}")
      def vocabOf(m: BpeTrainer.Model) =
        m.vocab.select("word", "n", "syms").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
          .sortBy(_._1).toSeq
      assert(vocabOf(batched) == vocabOf(seq))
    }
  }

  private def forAllProp[A](gen: org.scalacheck.Gen[A], n: Int)(
      f: A => Unit): Unit = new PropHelpers {}.forAll(gen, n)(f)

  test("equal-count pairs batch when disjoint, stop the batch when " +
      "touched") {
    import spark.implicits._
    // (a,b) and (c,d) tie on count but share no symbol — ONE batch
    // must take both (an early guard wrongly scanned accepted rows
    // for the equal-count threat and serialized exactly this case)
    val disjoint = Seq("ab ab ab", "cd cd cd").toDF("text")
    val m1 = BpeTrainer.trainMerges(disjoint, "text", nMerges = 2,
      minCount = 2, batchK = 4)
    assert(m1.merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("c", "d")))
    assert(m1.actions == 2, // alphabet collect + ONE batch collect
      s"equal-count disjoint pairs split into ${m1.actions - 1} batches")
    // (a,b) and (b,c) tie on count AND share b — the batch must stop
    // after the argmax (the tie's winner after merge 1 depends on
    // reduced counts only sequential evaluation can see)
    val touched = Seq("abc abc abc").toDF("text")
    val m2 = BpeTrainer.trainMerges(touched, "text", nMerges = 2,
      minCount = 2, batchK = 4)
    val s2 = BpeTrainer.trainMergesSequential(touched, "text",
      nMerges = 2, minCount = 2)
    assert(m2.merges == s2.merges)
    assert(m2.actions == 3, // alphabet + two single-merge batch collects
      s"equal-count touched tie batched unsafely: ${m2.actions} actions")
  }

  test("count ties over supplementary-plane symbols follow Spark's " +
      "UTF8 binary order, not Java's") {
    // Java String order is UTF-16 code-unit order: a surrogate pair
    // (0xD800 lead) ranks BEFORE U+E000; Spark's UTF8String compares
    // UTF-8 bytes, where U+E000 (EE 80 80) ranks BEFORE U+10000
    // (F0 90 80 80). The batched trainer's driver re-sort of the
    // collected candidate list must match the Spark orderBy/limit and
    // the sequential argmax — an ASCII-only fuzz can never catch this.
    import spark.implicits._
    val e = "\uE000"      // BMP private-use, UTF-8 EE 80 80
    val s = "\uD800\uDC00" // U+10000, UTF-8 F0 90 80 80
    assert(graft.ops.BpeTrainer.Utf8Order.compare(e, s) < 0)
    assert(e.compareTo(s) > 0) // Java order disagrees — the trap
    val docs = Seq(s"${e}b ${e}b ${s}b ${s}b").toDF("text")
    val batched = BpeTrainer.trainMerges(docs, "text", nMerges = 2,
      minCount = 2, batchK = 4)
    val seq = BpeTrainer.trainMergesSequential(docs, "text", nMerges = 2,
      minCount = 2)
    assert(batched.merges == seq.merges)
    // the count tie's winner is the UTF8-smaller left symbol
    assert(batched.merges.head.left == e, batched.merges.toString)
  }

  test("batched trainMerges needs >= 5x fewer driver actions at " +
      "nMerges = 50") {
    // the production shape the batching exists for: a 32k-merge vocab
    // must not mean 32k sequential Spark jobs. Corpus engineered for
    // clean batches (disjoint 2-char words, strictly decreasing
    // counts); correctness on conflict-heavy corpora is the fuzz
    // test's job — here we pin the ACTION economics.
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      val w = s"${(0x41 + i).toChar}${(0xC0 + i).toChar}"
      Seq.fill(600 - 10 * i)(w).mkString(" ")
    }.toDF("text")
    val batched = BpeTrainer.trainMerges(docs, "text", nMerges = 50,
      minCount = 2, batchK = 16)
    val seq = BpeTrainer.trainMergesSequential(docs, "text", nMerges = 50,
      minCount = 2)
    assert(batched.merges == seq.merges)
    assert(batched.merges.size == 50)
    assert(batched.actions * 5 <= seq.actions,
      s"batched=${batched.actions} actions vs sequential=${seq.actions}")
  }

  test("Zipf vocabulary at nMerges = 200: batching strictly beats " +
      "sequential actions, and a batched round costs one collect") {
    // VERDICT r16 #5's measurement, with its finding applied: on a
    // Zipf word table (the shape real text has) realized fill is only
    // ~1.6-2 merges/batch — early BPE pair counts are dominated by
    // single hot words, so exact count ties chain through shared
    // symbols and the touched/eqThreat guards stop batches early.
    // That is a property of the PROBLEM (sequential order genuinely
    // depends on reduced counts), not of the guard: the r17 response
    // is to make a batched round cost exactly a sequential round (one
    // argmax collect; the collision symbol join is now a driver-side
    // superset, the checkpoint lazy), so fill > 1 strictly wins and
    // fill = 1 ties — batching never pays WITHOUT winning again.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alpha = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
    val words = (0 until 300).map { _ =>
      val len = 3 + rnd.nextInt(6)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct
    val docs = words.zipWithIndex.map { case (w, r) =>
      Seq.fill(math.max(1, 1000 / (r + 1)))(w).mkString(" ")
    }.toDF("text")
    val m = BpeTrainer.trainMerges(docs, "text", nMerges = 200,
      minCount = 2, batchK = 16)
    assert(m.merges.size >= 100,
      s"corpus trained out after ${m.merges.size} merges — " +
        "regenerate a richer vocabulary")
    // actions = 1 (alphabet) + one collect per round — no per-round
    // checkpoint job, no symbol-set join
    val rounds = m.actions - 1
    val fill = m.merges.size.toDouble / rounds
    assert(fill >= 1.5,
      s"realized fill $fill (${m.merges.size} merges / $rounds rounds)")
    // strict dominance: sequential would cost merges+1 collects of the
    // same shape; batched must use strictly fewer
    assert(m.actions < m.merges.size,
      s"batched actions ${m.actions} not under ${m.merges.size} " +
        "sequential collects — batching pays without winning")
    // the argmax invariant (identity vs sequential is fuzz-pinned
    // elsewhere; 200 sequential rounds here would cost minutes)
    val cnts = m.merges.map(_.count)
    assert(cnts.zip(cnts.drop(1)).forall { case (a, b) => a >= b })
  }

  test("segment reassembles every word losslessly; OOV falls back to chars") {
    import spark.implicits._
    val train = Seq("low lower low", "new newest").toDF("text")
    val model = BpeTrainer.trainMerges(train, "text", nMerges = 5)
    val serve = Seq((1L, "low newest zebra")).toDF("doc_id", "text")
    val seg = BpeTrainer.segment(serve, "doc_id", "text", model)
      .orderBy("word_pos", "sub_pos").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(4)))
    // concat of subwords per word == the word (lossless)
    seg.groupBy(t => (t._1, t._2)).foreach { case ((_, w), rows) =>
      assert(rows.map(_._3).mkString("") == w)
    }
    // zebra shares no trained symbols → pure character fallback
    assert(seg.filter(_._2 == "zebra").map(_._3).toSeq ==
      Seq("z", "e", "b", "r", "a"))
    // in-vocab word uses the trained (merged, shorter-than-chars) split
    assert(seg.count(_._2 == "low") < 3)
  }
}
