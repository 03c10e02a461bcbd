package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CacheHandle, QueryCaches}

/** The session cache ledger: declared queries persist through it (or
  * through an explicit CacheHandle) and the harness reclaims
  * everything per query — a leak here is invisible locally but
  * accumulates executor memory in a long-lived session.
  */
class QueryCachesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("ledger-tracked persists are reclaimed by releaseAll") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
      .transform(QueryCaches.persist)
    df.count() // materialize the cache
    assert(df.storageLevel != StorageLevel.NONE, "not persisted")
    QueryCaches.releaseAll()
    assert(df.storageLevel == StorageLevel.NONE, "leaked after releaseAll")
  }

  test("handle-accepting ops with no handle register in the ledger") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "something else entirely here")).toDF("doc_id", "text")
    // no handle passed: the op's internal persists must land in the
    // session ledger rather than leak
    graft.ops.Corpus.unigramLogProb(docs, "doc_id", "text").collect()
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    QueryCaches.releaseAll()
    val cachedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(cachedBefore >= 2, s"expected internal caches, saw $cachedBefore")
    assert(cachedAfter < cachedBefore,
      s"releaseAll freed nothing ($cachedBefore -> $cachedAfter)")
  }

  test("an explicit CacheHandle keeps ownership away from the ledger") {
    import spark.implicits._
    val h = new CacheHandle
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val scored = graft.ops.Corpus.unigramLogProb(docs, "doc_id", "text", h)
    scored.collect()
    QueryCaches.releaseAll() // must NOT touch handle-owned caches
    h.release()              // the owner cleans up
  }
}
