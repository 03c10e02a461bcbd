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

  test("linkageEm separates a planted mixture: m above u, lambda near truth") {
    import spark.implicits._
    // 100 match-like pairs (mostly all-agree) + 900 non-match-like
    // (mostly all-disagree), with 10% per-field noise on both sides —
    // EM must recover m_i >> u_i and lambda near 0.1 without labels
    // seeded INDEPENDENT per-field noise — modular noise is
    // cross-field correlated and breaks the conditional-independence
    // model EM fits (the first draft converged to a different split)
    val rng = new scala.util.Random(42)
    def noisy(p: Double) = if (rng.nextDouble() < p) 1 else 0
    val rows = (0 until 100).map { _ =>
      (noisy(0.9), noisy(0.9), noisy(0.9))
    } ++ (0 until 900).map { _ =>
      (noisy(0.1), noisy(0.1), noisy(0.1))
    }
    val df = rows.toDF("g1", "g2", "g3")
    val (lam, m, u) = FuzzyJoin.linkageEm(df, Seq("g1", "g2", "g3"),
      iters = 8)
    assert(lam > 0.05 && lam < 0.2, s"lambda=$lam")
    (0 until 3).foreach { i =>
      assert(m(i) > 0.7 && u(i) < 0.3, s"field $i: m=${m(i)} u=${u(i)}")
    }
  }

  test("linkageEm is bit-stable under input partitioning and row order") {
    import spark.implicits._
    val rows = (0 until 500).map(i =>
      (if (i % 7 == 0) 1 else 0, if (i % 3 == 0) 1 else 0,
        if (i % 5 == 0) 1 else 0))
    val base = rows.toDF("g1", "g2", "g3")
    val a = FuzzyJoin.linkageEm(base.repartition(1), Seq("g1", "g2", "g3"), 4)
    val b = FuzzyJoin.linkageEm(
      base.repartition(32, org.apache.spark.sql.functions.col("g2")),
      Seq("g1", "g2", "g3"), 4)
    // decimal-exact pattern sums + a lexicographically-irrelevant
    // 8-row collect: the trajectories must be IDENTICAL doubles
    assert(a._1 == b._1 && a._2.sameElements(b._2) &&
      a._3.sameElements(b._3), s"$a vs $b")
  }

  test("linkageEm rejects empty input and out-of-range inits") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Int, Int)].toDF("g1", "g2", "g3")
    assertThrows[IllegalArgumentException](
      FuzzyJoin.linkageEm(empty, Seq("g1", "g2", "g3"), 2))
    val one = Seq((1, 0, 1)).toDF("g1", "g2", "g3")
    assertThrows[IllegalArgumentException](
      FuzzyJoin.linkageEm(one, Seq("g1", "g2", "g3"), 0))
    assertThrows[IllegalArgumentException](
      FuzzyJoin.linkageEm(one, Seq("g1", "g2", "g3"), 2, lam0 = 1.0))
    // in (0,1) but outside the band: a 1e-20 init would round every
    // 14dp E-step term of the match side to zero (0/0 -> NaN params)
    assertThrows[IllegalArgumentException](
      FuzzyJoin.linkageEm(one, Seq("g1", "g2", "g3"), 2, lam0 = 1e-20))
  }

  test("linkageEm tracks a plain-double reference EM under fuzz") {
    // algorithmic-drift pin: the decimal-exact accumulation must stay
    // within numerical noise of the textbook recursion (the 14dp
    // rounding per term perturbs sums by ~1e-14 relative)
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 6) {
      val rows = (0 until 300).map(_ =>
        (rng.nextInt(2), rng.nextInt(2), rng.nextInt(2)))
      val counts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // reference: same recursion, plain double sums
      var lam = 0.1; var m = Array(0.85, 0.85, 0.85)
      var u = Array(0.15, 0.15, 0.15)
      for (_ <- 1 to 4) {
        var a = 0.0; var b = 0.0
        val ai = Array(0.0, 0.0, 0.0); val bi = Array(0.0, 0.0, 0.0)
        counts.foreach { case ((g1, g2, g3), n) =>
          val g = Array(g1, g2, g3)
          var pm = 1.0; var pu = 1.0
          (0 until 3).foreach { i =>
            pm *= (if (g(i) == 1) m(i) else 1.0 - m(i))
            pu *= (if (g(i) == 1) u(i) else 1.0 - u(i))
          }
          val w = lam * pm / (lam * pm + (1.0 - lam) * pu)
          a += w * n; b += (1.0 - w) * n
          (0 until 3).foreach { i =>
            if (g(i) == 1) { ai(i) += w * n; bi(i) += (1.0 - w) * n }
          }
        }
        lam = a / (a + b); m = ai.map(_ / a); u = bi.map(_ / b)
      }
      val (gl, gm, gu) = FuzzyJoin.linkageEm(
        rows.toDF("g1", "g2", "g3"), Seq("g1", "g2", "g3"), 4)
      assert(math.abs(gl - lam) < 1e-9, s"lam $gl vs $lam")
      (0 until 3).foreach { i =>
        assert(math.abs(gm(i) - m(i)) < 1e-9, s"m$i ${gm(i)} vs ${m(i)}")
        assert(math.abs(gu(i) - u(i)) < 1e-9, s"u$i ${gu(i)} vs ${u(i)}")
      }
    }
  }
}
