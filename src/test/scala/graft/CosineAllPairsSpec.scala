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
}
