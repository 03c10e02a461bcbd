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

  test("pairsCapped: subset of the truth under fuzz, equal when " +
      "nothing is dropped; planted hot postings are dropped and " +
      "reported") {
    import spark.implicits._
    import org.scalacheck.Gen
    // narrow alphabet + repetition → hot prefix postings in many
    // samples, so the lossy path genuinely runs
    val alpha = Vector("a", "b", "c")
    val genDoc = for {
      len <- Gen.choose(2, 8)
      rep <- Gen.choose(1, 2)
      ws <- Gen.listOfN(len, Gen.oneOf(alpha))
    } yield Iterator.fill(rep)(ws).flatten.mkString(" ")
    val genCorpus = for {
      n <- Gen.choose(4, 12)
      docs <- Gen.listOfN(n, genDoc)
      tau <- Gen.oneOf(0.5, 0.8)
      cap <- Gen.oneOf(2, 4, 1000)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      tau, cap)
    new PropHelpers {}.forAll(genCorpus, n = 10) { case (rows, tau, cap) =>
      val df = rows.toDF("doc_id", "text")
      val (pairs, over) = CosineAllPairs.pairsCapped(
        df, "doc_id", "text", shingleN = 3, threshold = tau,
        maxPrefixPosting = cap)
      val got = collectPairs(pairs)
      val expected = brute(rows, tau)
      // lossy only ever DOWN, and emitted stats are the true integers
      assert((got -- expected).isEmpty,
        s"tau=$tau cap=$cap extra=${got -- expected}")
      // with nothing over the cap the twin IS the exact join
      if (over.isEmpty) assert(got == expected,
        s"tau=$tau cap=$cap missing=${expected -- got}")
      graft.ops.QueryCaches.releaseAll()
    }

    // planted degeneracy: 40 identical docs share one hot shingle —
    // dropped and reported — while a clean near-dup pair elsewhere
    // still comes through the capped plan
    val planted = ((0L until 40L).map(i => (i, "x x x")) ++
      Seq((100L, "a b c d e f"), (101L, "a b c d e f")))
      .toDF("doc_id", "text")
    val (cp, cOver) = CosineAllPairs.pairsCapped(
      planted, "doc_id", "text", shingleN = 3, threshold = 0.8,
      maxPrefixPosting = 16)
    val dropped = cOver.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dropped == Set(("x x x", 40L)), dropped)
    assert(collectPairs(cp).map(p => (p._1, p._2)) == Set((100L, 101L)))
    graft.ops.QueryCaches.releaseAll()
  }

  private def scratch(tp: String): String =
    graft.Tables.scratchDir(spark, tp).toString

  private def dropIndex(tp: String): Unit =
    Seq("_rank", "_pref", "_tf", "_tfs", "_raised", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $tp$s"))

  test("raised-shingle compensation is load-bearing: a qualifying " +
      "pair whose only shared shingle sits past the stored prefix " +
      "is recovered exactly") {
    // hand-built miss (shingleN = 1, τ = 0.85): corpus b = 'v v r'
    // (ŵ_v = 2/√5 ≈ .894), filler c1 = 'v p p p' keeps df_v = 2 so v
    // ranks LAST in b's scan; b's prefix cuts before v (suffix bound
    // .8 < .85) — the stored prefixes are {r} and {p}. Batch a = 'v'
    // has ŵ_v = 1 > frozen maxw .894 (raised) and cos(a, b) =
    // 2/√5 ≈ .894 ≥ .85 qualifies, but shares NOTHING with any
    // stored prefix: the prefix join alone returns empty, and only
    // the raised-shingle full-posting injection recovers the pair —
    // the cosine-specific hazard the Jaccard index family does not
    // have, caught and compensated exactly.
    import spark.implicits._
    val corpus = Seq((0L, "v v r"), (1L, "v p p p")).toDF("doc_id", "text")
    val batch = Seq((100L, "v")).toDF("doc_id", "text")
    val tp = "graft_cosidx_raised"
    try {
      CosineAllPairs.writeIndex(corpus, "doc_id", "text", tp,
        buckets = 4, shingleN = 1, threshold = 0.85,
        pathPrefix = Some(scratch(tp)))
      // the stored corpus prefixes really exclude v — the miss is real
      val storedPref = spark.table(s"${tp}_pref").collect()
        .map(r => (r.getString(r.fieldIndex("shingle")),
          r.getLong(r.fieldIndex("doc_id")))).toSet
      assert(storedPref == Set(("r", 0L), ("p", 1L)), storedPref)
      val got = collectPairs(CosineAllPairs.pairsAgainstIndexed(
        spark, tp, batch, "doc_id", "text", shingleN = 1,
        threshold = 0.85, maxPrefixPosting = 16))
      // (a=100, b=0): num = 1·2 = 2, na2 = 1, nb2 = 5; c1 is a
      // compensation candidate too but verifies below τ (cos ≈ .316)
      assert(got == Set((100L, 0L, 2L, 1L, 5L)), got)
      graft.ops.QueryCaches.releaseAll()
    } finally {
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("indexed cosine equals pairsAgainst under fuzz, including " +
      "batch-raised max weights and unseen shingles") {
    // the freeze-and-compensate contract end to end: repetition-heavy
    // batch docs raise frozen max weights in most samples, z tokens
    // exercise the absent-shingle order class, and the ground truth
    // is the re-ranking variant (itself oracle- and brute-pinned)
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c", "d", "e")
    def genDoc(v: Vector[String], maxRep: Int) = for {
      len <- Gen.choose(2, 10)
      rep <- Gen.choose(1, maxRep)
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
    val tp = "graft_cosidx_fuzz"
    try {
      new PropHelpers {}.forAll(genCorpus, n = 6) { case (crows, brows, tau) =>
        val cdf = crows.toDF("doc_id", "text")
        val bdf = brows.toDF("doc_id", "text")
        CosineAllPairs.writeIndex(cdf, "doc_id", "text", tp,
          buckets = 4, shingleN = 3, threshold = tau,
          pathPrefix = Some(scratch(tp)))
        val got = collectPairs(CosineAllPairs.pairsAgainstIndexed(
          spark, tp, bdf, "doc_id", "text", shingleN = 3,
          threshold = tau))
        val expected = collectPairs(CosineAllPairs.pairsAgainst(
          cdf, bdf, "doc_id", "text", shingleN = 3, threshold = tau))
        assert(got == expected,
          s"tau=$tau extra=${got -- expected} missing=${expected -- got}")
        graft.ops.QueryCaches.releaseAll()
      }
    } finally {
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("appendIndex: build + append answers like a fresh union " +
      "index, raises are logged, and the meta contract rejects " +
      "mismatched calls") {
    // lifecycle fuzz: append docs repeat tokens (raising frozen max
    // weights — the `_raised` log drives reader compensation) and
    // carry shingles the frozen rank never saw (rn-null rows joining
    // order-class one at their text position)
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c", "d", "e")
    def genDoc(v: Vector[String], maxRep: Int) = for {
      len <- Gen.choose(2, 10)
      rep <- Gen.choose(1, maxRep)
      ws <- Gen.listOfN(len, Gen.oneOf(v))
    } yield Iterator.fill(rep)(ws).flatten.mkString(" ")
    val genCorpus = for {
      n1 <- Gen.choose(3, 6)
      n2 <- Gen.choose(3, 6)
      nb <- Gen.choose(3, 6)
      c1 <- Gen.listOfN(n1, genDoc(alpha, 1))
      c2 <- Gen.listOfN(n2, genDoc(alpha :+ "y", 3)) // raises + unseen
      bd <- Gen.listOfN(nb, genDoc(alpha ++ Vector("y", "z"), 3))
      tau <- Gen.oneOf(0.5, 0.8)
    } yield (c1.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      c2.zipWithIndex.map { case (t, i) => (100L + i, t) },
      bd.zipWithIndex.map { case (t, i) => (1000L + i, t) }, tau)
    val tp = "graft_cosapp_fuzz"
    try {
      new PropHelpers {}.forAll(genCorpus, n = 5) {
        case (c1, c2, brows, tau) =>
          val c1df = c1.toDF("doc_id", "text")
          val c2df = c2.toDF("doc_id", "text")
          val bdf = brows.toDF("doc_id", "text")
          CosineAllPairs.writeIndex(c1df, "doc_id", "text", tp,
            buckets = 4, shingleN = 3, threshold = tau,
            pathPrefix = Some(scratch(tp)))
          CosineAllPairs.appendIndex(spark, tp, c2df, "doc_id", "text",
            buckets = 4, shingleN = 3, threshold = tau)
          val got = collectPairs(CosineAllPairs.pairsAgainstIndexed(
            spark, tp, bdf, "doc_id", "text", shingleN = 3,
            threshold = tau))
          val expected = collectPairs(CosineAllPairs.pairsAgainst(
            c1df.unionAll(c2df), bdf, "doc_id", "text", shingleN = 3,
            threshold = tau))
          assert(got == expected,
            s"tau=$tau extra=${got -- expected} missing=${expected -- got}")
          graft.ops.QueryCaches.releaseAll()
      }

      // a deterministic raising append: 'v v r' raises v's frozen max
      // (2/√5 > 1/√10 from the build's 'v p p p') — logged, and the
      // reader still matches the ground truth through the log
      CosineAllPairs.writeIndex(
        Seq((0L, "v p p p")).toDF("doc_id", "text"),
        "doc_id", "text", tp, buckets = 4, shingleN = 1,
        threshold = 0.8, pathPrefix = Some(scratch(tp)))
      CosineAllPairs.appendIndex(spark, tp,
        Seq((1L, "v v r")).toDF("doc_id", "text"),
        "doc_id", "text", buckets = 4, shingleN = 1, threshold = 0.8)
      assert(spark.table(s"${tp}_raised").collect()
        .map(_.getString(0)).toSeq == Seq("v"))
      val got2 = collectPairs(CosineAllPairs.pairsAgainstIndexed(
        spark, tp, Seq((100L, "v v r")).toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 1, threshold = 0.8))
      assert(got2 == Set((100L, 1L, 5L, 5L, 5L)), got2) // exact dup of 1
      graft.ops.QueryCaches.releaseAll()

      // the meta contract: τ' < τ_build, shingleN and buckets
      // mismatches are rejected loudly (a silent τ' < τ_build read
      // would be lossy by construction)
      val exT = intercept[IllegalArgumentException] {
        CosineAllPairs.pairsAgainstIndexed(spark, tp,
          Seq((100L, "v")).toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 1, threshold = 0.5)
      }
      assert(exT.getMessage.contains("build threshold"), exT.getMessage)
      val exN = intercept[IllegalArgumentException] {
        CosineAllPairs.pairsAgainstIndexed(spark, tp,
          Seq((100L, "v")).toDF("doc_id", "text"), "doc_id", "text",
          shingleN = 3, threshold = 0.8)
      }
      assert(exN.getMessage.contains("shingleN"), exN.getMessage)
      val exA = intercept[IllegalArgumentException] {
        CosineAllPairs.appendIndex(spark, tp,
          Seq((2L, "v")).toDF("doc_id", "text"), "doc_id", "text",
          buckets = 8, shingleN = 1, threshold = 0.8)
      }
      assert(exA.getMessage.contains("buckets"), exA.getMessage)
      graft.ops.QueryCaches.releaseAll()
    } finally {
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("sharded cosine index: reader prunes corpus directories the " +
      "batch never touches, stays exact, and appends land in-shard") {
    // the TextDedup sharded-index layout at cosine semantics:
    // _rank/_pref shard on hash(shingle), _tf on hash(id); a batch
    // touching few shingles reads few directories on EVERY corpus
    // scan — measured via the executed scans' numFiles — while
    // answering exactly the re-ranking variant's cross pairs
    import spark.implicits._
    val corpusDf = (0L until 40L)
      .map(i => (i, s"c${i}a c${i}b c${i}c c${i}d c${i}e"))
      .toDF("doc_id", "text")
    val batchDf = Seq((100L, "c7a c7b c7c c7d c7e f"))
      .toDF("doc_id", "text")
    val tp = "graft_cosidx_shard"
    try {
      CosineAllPairs.writeIndex(corpusDf, "doc_id", "text", tp,
        buckets = 2, shingleN = 3, threshold = 0.5,
        pathPrefix = Some(scratch(tp)), shardBy = 16)
      val got = CosineAllPairs.pairsAgainstIndexed(spark, tp, batchDf,
          "doc_id", "text", shingleN = 3, threshold = 0.5)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = CosineAllPairs.pairsAgainst(corpusDf, batchDf,
          "doc_id", "text", shingleN = 3, threshold = 0.5)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected && got == Set((100L, 7L)), s"$got vs $expected")
      graft.ops.QueryCaches.releaseAll()
      // measured pruning on all three corpus tables (AQE off: stages
      // hide executed subtrees — the CLAUDE.md rule)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val prunedScan = CosineAllPairs.pairsAgainstIndexed(spark, tp,
          batchDf, "doc_id", "text", shingleN = 3, threshold = 0.5)
        prunedScan.collect()
        // the _rank scan hides under the persisted batch-prefix
        // frame — recurse cached subtrees (the WindowAudit rule)
        import org.apache.spark.sql.execution.SparkPlan
        def fragments(p: SparkPlan): Seq[SparkPlan] =
          p +: p.collect {
            case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
              fragments(s.relation.cachedPlan)
          }.flatten
        val frs = fragments(prunedScan.queryExecution.executedPlan)
        for (t <- Seq("_rank", "_pref", "_tf")) {
          val allFiles = spark.table(s"$tp$t").inputFiles.length
          val scans = frs.flatMap(_.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec
                if f.toString.contains(s"$tp$t") => f
          })
          assert(scans.nonEmpty, s"no $t scan found in the plan")
          assert(scans.forall(_.toString.contains("__shard")),
            s"$t scan carries no __shard partition filter:\n" + scans.head)
          val read = scans.map(_.metrics("numFiles").value).max
          assert(read > 0 && read < allFiles,
            s"$t pruning read $read of $allFiles files — expected a " +
              "strict cut")
        }
        // an unraised night never touches the posting sidecar at all
        assert(!frs.exists(_.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.toString.contains(s"${tp}_tfs") => f
        }.nonEmpty), "_tfs read on a night with no raised shingles")

        // a RAISED night reads _tfs — keyed, shard-filtered, and
        // strictly pruned (the batch concentrates tf mass on doc 7's
        // first shingle, raising its frozen max weight; the pair
        // itself verifies below τ, which is fine — the pin is the
        // compensation scan's SHAPE)
        val raisedBatch = Seq((101L, "c7a c7b c7c c7a c7b c7c"))
          .toDF("doc_id", "text")
        val raisedScan = CosineAllPairs.pairsAgainstIndexed(spark, tp,
          raisedBatch, "doc_id", "text", shingleN = 3, threshold = 0.5)
        assert(raisedScan.collect().isEmpty) // cos = 2/√18 < 0.5
        val rfrs = fragments(raisedScan.queryExecution.executedPlan)
        val tfsScans = rfrs.flatMap(_.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.toString.contains(s"${tp}_tfs") => f
        })
        assert(tfsScans.nonEmpty, "raised night did not read _tfs")
        assert(tfsScans.forall(_.toString.contains("__shard")),
          "_tfs scan carries no __shard partition filter")
        val allTfs = spark.table(s"${tp}_tfs").inputFiles.length
        val readTfs = tfsScans.map(_.metrics("numFiles").value).max
        assert(readTfs > 0 && readTfs < allTfs,
          s"_tfs pruning read $readTfs of $allTfs files — expected a " +
            "strict cut")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      graft.ops.QueryCaches.releaseAll()

      // appends land in their keys' shards: a new-alphabet doc joins
      // the index and is found exactly — including through the
      // raised/compensation machinery if its weights raise anything
      CosineAllPairs.appendIndex(spark, tp,
        Seq((200L, "n1 n2 n3 n4 n5")).toDF("doc_id", "text"),
        "doc_id", "text", buckets = 2, shingleN = 3, threshold = 0.5)
      val got2 = CosineAllPairs.pairsAgainstIndexed(spark, tp,
          Seq((300L, "n1 n2 n3 n4 n5 n6")).toDF("doc_id", "text"),
          "doc_id", "text", shingleN = 3, threshold = 0.5)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 == Set((300L, 200L)), got2)
      graft.ops.QueryCaches.releaseAll()
    } finally {
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("indexed cosine: zero shuffle exchange above every " +
      "corpus-side bucketed scan, build + append layout") {
    // the scale contract the index exists for (the
    // prefixJaccardAgainstIndexed plan pin at cosine semantics):
    // _rank/_pref (bucketed by shingle) and _tf (bucketed by id) are
    // read with no exchange between the scan and its join — tonight's
    // shuffles are all batch-sized. Appending first pins that
    // multi-file buckets keep the property (they only cost a re-sort).
    import spark.implicits._
    val corpusDf = (0L until 60L)
      .map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} t$i u$i"))
      .toDF("doc_id", "text")
    val batchDf = (0L until 20L)
      .map(i => (i + 100L, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} t$i u$i v$i"))
      .toDF("doc_id", "text")
    val tp = "graft_cosidx_plan"
    try {
      CosineAllPairs.writeIndex(corpusDf, "doc_id", "text", tp,
        buckets = 4, shingleN = 3, threshold = 0.5,
        pathPrefix = Some(scratch(tp)))
      CosineAllPairs.appendIndex(spark, tp,
        (200L until 220L)
          .map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} p$i q$i"))
          .toDF("doc_id", "text"),
        "doc_id", "text", buckets = 4, shingleN = 3, threshold = 0.5)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = CosineAllPairs.pairsAgainstIndexed(spark, tp, batchDf,
        "doc_id", "text", shingleN = 3, threshold = 0.5)
      import org.apache.spark.sql.execution.SparkPlan
      def fragments(p: SparkPlan): Seq[SparkPlan] =
        p +: p.collect {
          case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            fragments(s.relation.cachedPlan)
        }.flatten
      val names = Seq("_rank", "_pref", "_tf").map(tp + _)
      // an exchange whose UNARY path down reaches a corpus FILE scan
      // without crossing a join is a corpus-side shuffle; see the
      // TextDedupSpec pin for why only FileSourceScanExec counts
      def reachesScan(p: SparkPlan): Boolean = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          names.exists(f.toString.contains)
        case _ if p.children.length == 1 => reachesScan(p.children.head)
        case _ => false
      }
      val frs = fragments(out.queryExecution.executedPlan)
      val offenders = frs.flatMap(_.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if reachesScan(e.child) => e
      })
      assert(offenders.isEmpty,
        "a corpus-side bucketed scan still shuffles:\n" +
          offenders.map(_.toString).mkString("\n---\n"))
      val allStr = frs.map(_.toString).mkString("\n")
      names.foreach { n =>
        assert(allStr.contains(n), s"plan does not read $n:\n$allStr")
      }
      assert(out.count() > 0L)
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }
}
