package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs equals brute-force levenshtein at maxDist=1") {
    import spark.implicits._
    val raw = Seq((1L, "alpha01"), (2L, "alpha02"), (3L, "alpha11"),
      (4L, "beta01"), (5L, "alpha015"), (6L, "alpha01"))
    val got = FuzzyJoin.editDistancePairs(raw.toDF("id", "name"),
      "id", "name", maxDist = 1, maxPosting = Int.MaxValue)
      .select("a", "b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = (for {
      (i, x) <- raw; (j, y) <- raw if i < j
      d = lev(x, y) if d <= 1
    } yield (i, j, d)).toSet
    assert(got == want)
    assert(want.contains((1L, 6L, 0))) // exact dup comes through too
  }

  test("hot-gram cap yields a subset of the uncapped result") {
    import spark.implicits._
    // every name shares the hot prefix "xx"; capping that posting
    // keeps the join bounded and only drops pairs, never invents them
    val names = (1 to 30).map(i => (i.toLong, f"xx$i%02d"))
      .toDF("id", "name")
    val capped = FuzzyJoin.editDistancePairs(names, "id", "name",
      maxDist = 1, maxPosting = 5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = FuzzyJoin.editDistancePairs(names, "id", "name",
      maxDist = 1, maxPosting = Int.MaxValue)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(full))
    assert(full.nonEmpty)
  }

  test("capBlocks drops over-cap blocks and passes the rest through untouched") {
    import spark.implicits._
    // block "big" has 5 members, "small" has 2
    val rows = ((1 to 5).map(i => (i.toLong, "big")) ++
      Seq((10L, "small"), (11L, "small"))).toDF("id", "blk")
    val capped = FuzzyJoin.capBlocks(rows, Seq("blk"), maxBlockSize = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(capped == Seq(10L, 11L))
    // Int.MaxValue skips the cap entirely (the oracle-gate setting):
    // same frame back, no cap aggregate in the plan
    val un = FuzzyJoin.capBlocks(rows, Seq("blk"), Int.MaxValue)
    assert(un eq rows)
  }

  test("strings shorter than q are silently un-pairable, not an error") {
    import spark.implicits._
    val names = Seq((1L, "a"), (2L, "b"), (3L, "ab")).toDF("id", "name")
    val got = FuzzyJoin.editDistancePairs(names, "id", "name", maxDist = 1,
      maxPosting = Int.MaxValue).count()
    assert(got == 0L)
  }
}
