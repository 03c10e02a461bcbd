package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Retrieval

class RetrievalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark runs fast"),     // tf=3, short
    (2L, "spark runs on a cluster of many machines with many cores"),
    (3L, "nothing relevant here at all"),
    (4L, "spark")) // tf=1, shortest doc
    .toDF("doc_id", "text")

  test("bm25 scores only matching docs; tf raises and dl lowers the score") {
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("spark"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out.keySet == Set(1L, 2L, 4L)) // doc 3 never matches
    // same dl would make tf=3 > tf=1; here doc 1 is also shorter — both
    // effects point the same way
    assert(out(1L) > out(2L))
    // shortest doc with tf=1 still beats the long tf=1 doc (dl norm)
    assert(out(4L) > out(2L))
    // saturation: tf=3 gains less than 3x the tf=1 score (k1 damping)
    assert(out(1L) < 3.0 * out(4L))
  }

  test("bm25 sums per-term scores and counts matched terms") {
    val out = Retrieval.bm25(docs, "doc_id", "text",
      Seq("spark", "cluster", "cores"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(2L)._1 == 3L) // matches all three terms
    assert(out(1L)._1 == 1L)
    // more matched terms → strictly higher score than its single-term run
    val single = Retrieval.bm25(docs, "doc_id", "text", Seq("spark"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(2L)._2 > single(2L))
  }

  test("bm25 hand-check: the exact Robertson formula on one doc") {
    // single term, single matching doc keeps every constant visible
    val one = Seq((1L, "alpha beta"), (2L, "beta beta")).toDF("doc_id", "text")
    val score = Retrieval.bm25(one, "doc_id", "text", Seq("alpha"))
      .as[(Long, Long, Double)].collect().head._3
    val n = 2.0; val df = 1.0; val tf = 1.0; val dl = 2.0; val avgdl = 2.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val expected = idf * tf * 2.2 /
      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    assert(math.abs(score - expected) < 1e-6)
  }

  test("invertedIndex df/cf/posting on a tiny corpus") {
    import spark.implicits._
    val docs = Seq((3L, "b a a"), (1L, "a b"), (2L, "a"))
      .toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text", postingCap = 2)
      .orderBy("tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // a: df=3 cf=4, posting capped at the 2 smallest doc ids;
    // b: df=2 cf=2, both docs fit the cap
    assert(idx.toSeq ==
      Seq(("a", 3L, 4L, "1,2"), ("b", 2L, 2L, "1,3")))
  }

  test("sparseCosinePairs: identical docs score 1, disjoint score nothing") {
    import spark.implicits._
    // docs 1,2 identical; 3 shares one token with them; 4 disjoint;
    // 5 has only a token present in every doc except 4 — idf > 0
    val docs = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "x q q"), (4L, "p p"),
      (5L, "x")).toDF("doc_id", "text")
    val got = Retrieval.sparseCosinePairs(docs, "doc_id", "text",
      minSim = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got((1L, 2L)) == 1.0)
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // posting cap: with maxPosting 1 the shared-token join is empty
    assert(Retrieval.sparseCosinePairs(docs, "doc_id", "text",
      minSim = 0.0, maxPosting = 1).isEmpty)
  }
}
