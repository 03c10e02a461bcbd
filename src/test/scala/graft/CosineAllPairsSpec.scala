package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CosineAllPairs

/** The cosine AllPairs prefix filter against a driver-side brute
  * force over the SAME shingle-tf definition — the
  * prefixJaccardPairs spec pattern: losslessness (no pair missed)
  * and exactness (emitted stats are the true integers) under fuzz,
  * plus the hot-posting audit's loud failure.
  */
class CosineAllPairsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def tfOf(t: String): Map[String, Long] =
    t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toSeq
      .groupBy(identity).map { case (s, g) => s -> g.length.toLong }

  /** Brute-force qualifying pairs with the SAME double threshold
    * expression the operator (and the oracle) use — the association
    * must match so a boundary pair decides identically.
    */
  private def brute(rows: Seq[(Long, String)], tau: Double)
      : Set[(Long, Long, Long, Long, Long)] = {
    val sets = rows.map { case (id, t) => id -> tfOf(t) }
      .filter(_._2.nonEmpty)
    (for {
      (a, ta) <- sets; (b, tb) <- sets if a < b
      num = ta.keysIterator.filter(tb.contains)
        .map(k => ta(k) * tb(k)).sum
      na2 = ta.valuesIterator.map(v => v * v).sum
      nb2 = tb.valuesIterator.map(v => v * v).sum
      if num > 0 &&
        num.toDouble * num.toDouble >=
          tau * tau * (na2.toDouble * nb2.toDouble)
    } yield (a, b, num, na2, nb2)).toSet
  }

  private def collectPairs(d: org.apache.spark.sql.DataFrame) =
    d.select("a", "b", "num", "na2", "nb2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet

  test("planted near-dups: exact dup and tf-mix variants qualify, " +
      "set-overlapping but dissimilar docs do not") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d e f"),             // exact dup of 0: cos = 1
      (2L, "a b c a b c a b c a b c"), // heavy repetition of one shingle set
      (3L, "a b c a b c"),             // same SET as 2, different tf mix
      (4L, "p q r s t u"))             // unrelated
      .toDF("doc_id", "text")
    val got = CosineAllPairs.pairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.8)
    val pairsOnly = collectPairs(got).map(p => (p._1, p._2))
    assert(pairsOnly.contains((0L, 1L)), pairsOnly)
    assert(pairsOnly.contains((2L, 3L)), pairsOnly)
    assert(!pairsOnly.exists(p => p._1 == 4L || p._2 == 4L), pairsOnly)
    // emitted stats are the true integers (exact verification)
    val r01 = collectPairs(got).find(p => p._1 == 0L && p._2 == 1L).get
    assert(r01._3 == r01._4 && r01._4 == r01._5, r01) // cos = 1: num = na2 = nb2
    graft.ops.QueryCaches.releaseAll()
  }

  test("lossless and exact vs brute force under fuzz") {
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c", "d", "e")
    val genDoc = for {
      len <- Gen.choose(2, 12) // includes < shingleN docs (no vector)
      ws <- Gen.listOfN(len, Gen.oneOf(alpha))
    } yield ws.mkString(" ")
    val genCorpus = for {
      n <- Gen.choose(4, 14)
      docs <- Gen.listOfN(n, genDoc)
      tau <- Gen.oneOf(0.5, 0.7, 0.8, 0.9)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, tau)
    new PropHelpers {}.forAll(genCorpus, n = 12) { case (rows, tau) =>
      val got = collectPairs(CosineAllPairs.pairs(
        rows.toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, threshold = tau))
      val expected = brute(rows, tau)
      assert(got == expected,
        s"tau=$tau extra=${got -- expected} missing=${expected -- got}")
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("hot-posting audit fails loudly on a degenerate corpus; a " +
      "generous bound passes real ones") {
    import spark.implicits._
    val degenerate = (0L until 40L).map(i => (i, "x x x"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      CosineAllPairs.pairs(degenerate, "doc_id", "text",
        shingleN = 3, threshold = 0.8, maxPrefixPosting = 16)
    }
    assert(ex.getMessage.contains("prefix posting"), ex.getMessage)
    assert(ex.getMessage.contains("40 members"), ex.getMessage)
    graft.ops.QueryCaches.releaseAll()

    val normal = Seq(
      (0L, "a b c d e f"), (1L, "a b c d e f"),
      (2L, "p q r s t u"), (3L, "p q r s t u v"),
      (4L, "m n o m n o")).toDF("doc_id", "text")
    val audited = CosineAllPairs.pairs(normal, "doc_id", "text",
      shingleN = 3, threshold = 0.8, maxPrefixPosting = 16)
    assert(collectPairs(audited).map(p => (p._1, p._2)) ==
      Set((0L, 1L), (2L, 3L)))
    graft.ops.QueryCaches.releaseAll()
  }

  test("pairsAgainst equals the batch op on unioned input under fuzz, " +
      "including batch-raised max weights and unseen shingles") {
    // the cross-side contract: ONE rarity order over corpus ∪ batch,
    // and maxw as the union max — a corpus-frozen maxw would silently
    // under-include when a batch doc raises a shingle's max weight
    // (batch docs here repeat tokens, which concentrates tf mass and
    // raises ŵ), and batch-only shingles (z tokens) must order into
    // the shared rank without breaking either side's prefix.
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c", "d", "e")
    def genDoc(v: Vector[String], maxRep: Int) = for {
      len <- Gen.choose(2, 10)
      rep <- Gen.choose(1, maxRep) // repetition concentrates tf mass
      ws <- Gen.listOfN(len, Gen.oneOf(v))
    } yield Iterator.fill(rep)(ws).flatten.mkString(" ")
    val genCorpus = for {
      nc <- Gen.choose(3, 8)
      nb <- Gen.choose(3, 8)
      cd <- Gen.listOfN(nc, genDoc(alpha, 1))
      bd <- Gen.listOfN(nb, genDoc(alpha :+ "z", 3))
      tau <- Gen.oneOf(0.5, 0.8)
    } yield (cd.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      bd.zipWithIndex.map { case (t, i) => (1000L + i, t) }, tau)
    new PropHelpers {}.forAll(genCorpus, n = 8) { case (crows, brows, tau) =>
      val cdf = crows.toDF("doc_id", "text")
      val bdf = brows.toDF("doc_id", "text")
      val got = collectPairs(CosineAllPairs.pairsAgainst(
        cdf, bdf, "doc_id", "text", shingleN = 3, threshold = tau))
      // ids are disjoint (batch >= 1000), so the batch op on the
      // union restricted to cross pairs is ground truth; pairs emits
      // (a < b) = (corpus, batch) — reorient and swap the norms
      val expected = collectPairs(CosineAllPairs.pairs(
        cdf.unionAll(bdf), "doc_id", "text", shingleN = 3,
        threshold = tau))
        .filter(p => p._1 < 1000L && p._2 >= 1000L)
        .map(p => (p._2, p._1, p._3, p._5, p._4))
      assert(got == expected,
        s"tau=$tau extra=${got -- expected} missing=${expected -- got}")
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("pairsAgainst: side-tagged ids — corpus/batch id collisions " +
      "never conflate norms; cross audit fails loudly") {
    import spark.implicits._
    // id 0 exists on BOTH sides with different texts; id 1 collides
    // with an exact dup — a conflated norm would corrupt both
    val corpus = Seq(
      (0L, "p q r s t u"),
      (1L, "a b c d e f")).toDF("doc_id", "text")
    val batch = Seq(
      (0L, "a b c d e f"),  // dup of CORPUS 1, not of corpus 0
      (1L, "a b c d e f")). // dup of corpus 1 too
      toDF("doc_id", "text")
    val got = collectPairs(CosineAllPairs.pairsAgainst(
      corpus, batch, "doc_id", "text", shingleN = 3, threshold = 0.8))
    // every batch doc matches corpus 1 exactly: num = na2 = nb2 = 4
    assert(got == Set((0L, 1L, 4L, 4L, 4L), (1L, 1L, 4L, 4L, 4L)), got)
    graft.ops.QueryCaches.releaseAll()

    // the audit counts postings across corpus+batch — 20 + 20
    // identical docs trip a 16 bound even though each side is under
    val dgc = (0L until 20L).map(i => (i, "x x x")).toDF("doc_id", "text")
    val dgb = (100L until 120L).map(i => (i, "x x x")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      CosineAllPairs.pairsAgainst(dgc, dgb, "doc_id", "text",
        shingleN = 3, threshold = 0.8, maxPrefixPosting = 16)
    }
    assert(ex.getMessage.contains("corpus+batch"), ex.getMessage)
    assert(ex.getMessage.contains("40 members"), ex.getMessage)
    graft.ops.QueryCaches.releaseAll()
  }
}
