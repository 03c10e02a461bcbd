package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextDedup

/** Planted-duplicate tests: the oracle queries run over random word
  * salad, which proves engine parity but not detection behavior. Here
  * the corpus contains known exact dupes, near dupes, and distinct
  * documents, and each dedup family must find exactly what it should.
  */
class TextDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (0L, base),
      (1L, base), // exact dupe of 0
      (2L, base + " extra"), // near dupe of 0/1 (one appended token)
      (3L, "completely different words about spark query engines and data"),
      (4L, "the  quick   brown fox jumps over the lazy dog near the river bank today"), // ws-normalized dupe of 0
      (5L, "another unrelated document mentioning clusters and shuffles only"))
      .toDF("doc_id", "text")
  }

  test("exact dedup groups byte-identical and whitespace-normalized texts") {
    val groups = TextDedup.exact(corpus, "doc_id", "text")
      .filter(col("n_dups") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_id") == 0L)
    assert(groups.head.getAs[Long]("n_dups") == 3L) // 0, 1, 4
  }

  test("minhash LSH finds near-dupes above threshold, not distinct docs") {
    val pairs = TextDedup.minhashDedup(corpus, "doc_id", "text",
      shingleN = 3, numHashes = 6, bands = 3, threshold = 0.5)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact/near-dup cluster {0,1,2,4} should pair up
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    // distinct documents never pair
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("simhash: identical texts share fingerprints; distinct texts are far") {
    val sim = TextDedup.simhash(corpus, "doc_id", "text")
    val fp = sim.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    // doc 4's double spaces add an empty token: a couple of bits flip
    // but the fingerprint stays within near-dup hamming range — the
    // noise-resilience simhash exists for
    assert(java.lang.Long.bitCount(fp(0L) ^ fp(4L)) <= 3)
    val pairs = TextDedup.simhashPairs(sim, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhashPairs at maxHamming=0 degenerates to exact fingerprint equality") {
    val sim = TextDedup.simhash(corpus, "doc_id", "text")
    val pairs = TextDedup.simhashPairs(sim, "doc_id", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 0 and 1 are byte-identical → identical fingerprints
    assert(pairs.contains((0L, 1L)))
    assert(pairs.forall { case (a, b) => a < b })
    // out-of-range bounds are rejected, not silently degenerate
    intercept[IllegalArgumentException] {
      TextDedup.simhashPairs(sim, "doc_id", maxHamming = 32)
    }
  }

  test("dedupSegments keeps first span occurrence and reassembles docs") {
    import spark.implicits._
    def run(n: Int) = Seq.tabulate(n)(i => s"t$i").mkString(" ")
    val corpus = Seq(
      // two unique spans — fully kept
      (1L, (0 until 8).map(i => s"a$i").mkString(" ") + " " +
        (0 until 8).map(i => s"b$i").mkString(" ")),
      // exactly doc 1's second span — fully dropped (null clean_text)
      (2L, (0 until 8).map(i => s"b$i").mkString(" ")),
      // short partial span, unique — kept as-is
      (3L, "c0 c1 c2"),
      // internal repetition: second copy of its own span drops
      (4L, ((0 until 8) ++ (0 until 8)).map(i => s"d$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextDedup.dedupSegments(corpus, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(got(1L) == ((2L, 2L, Some(
      (0 until 8).map(i => s"a$i").mkString(" ") + " " +
        (0 until 8).map(i => s"b$i").mkString(" ")))))
    assert(got(2L) == ((1L, 0L, None)))
    assert(got(3L) == ((1L, 1L, Some("c0 c1 c2"))))
    assert(got(4L) == ((2L, 1L, Some((0 until 8).map(i => s"d$i").mkString(" ")))))
  }

  test("incremental segment dedup drops corpus spans with zero " +
    "exchange above the bucketed fingerprint scan") {
    import spark.implicits._
    def span(p: String) = (0 until 8).map(i => s"$p$i").mkString(" ")
    val corpusDocs = Seq((1L, span("a") + " " + span("b"))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, span("a")),                  // corpus dup: fully dropped
      (11L, span("c") + " " + span("b")), // second span in corpus
      (12L, span("c")))                   // in-batch dup of 11's first
      .toDF("doc_id", "text")
    TextDedup.writeSegmentFingerprints(
      corpusDocs, "doc_id", "text", "seg_fp_b", buckets = 4)
    try {
      // disable auto-broadcast so the lookup would otherwise shuffle
      // both sides — the bucketed layout must carry the corpus side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = TextDedup.dedupSegmentsAgainst(
        batch, "doc_id", "text", spark.table("seg_fp_b"))
      val got = out.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
      assert(got(10L) == ((1L, 0L, None)))
      assert(got(11L) == ((2L, 1L, Some(span("c")))))
      assert(got(12L) == ((1L, 0L, None)))
      val shufflesOverScan = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.toString.contains("seg_fp_b") => e
      }
      assert(shufflesOverScan.isEmpty,
        "bucketed corpus side still shuffles:\n" +
          out.queryExecution.executedPlan.toString)
      assert(out.queryExecution.executedPlan.toString.contains("seg_fp_b"),
        "plan does not read the bucketed table")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS seg_fp_b")
    }
  }

  test("clusters: connected components collapse chains to the smallest id") {
    import spark.implicits._
    val ids = (0L to 7L).toDF("id")
    // chain 0-1-2-3 (transitive near-dups), pair 5-6, singletons 4,7
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = TextDedup.clusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("clusters: deep duplicate chains converge in O(log) star rounds") {
    import spark.implicits._
    // a 120-hop revision-drift chain — each doc near-dups only its
    // neighbors — plus a reversed-id chain (worst case for min-label
    // propagation, which needs one full shuffle round per hop and used
    // to throw past diameter 10). Star contraction must collapse both
    // within the default round budget.
    val n = 120L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val reversed = (0L until n - 1).map(i => (1000L + n - i, 1000L + n - i - 1))
    val dupEdges = Seq((5L, 4L), (4L, 5L)) // duplicates + both orientations
    val pairs = (chain ++ reversed ++ dupEdges).toDF("a", "b")
    val ids = ((0L until n) ++ (1001L to 1000L + n)).toDF("id")
    val got = TextDedup.clusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 2 * n)
    (0L until n).foreach(i => assert(got(i) == 0L, s"node $i"))
    (1001L to 1000L + n).foreach(i => assert(got(i) == 1001L, s"node $i"))
  }

  test("clusters: star-edge incremental merge equals the full recompute") {
    import spark.implicits._
    // the q_cluster_incremental contract: yesterday's labels survive
    // as star edges (node → representative) and, unioned with the new
    // day's pairs, must reproduce the full-graph components exactly —
    // including merges that only the new edges create (old cluster ∪
    // old cluster, old ∪ new node, chains THROUGH new nodes).
    val rnd = new scala.util.Random(42)
    val n = 200L
    val all = (0 until 400).map { _ =>
      (rnd.nextLong(n).abs % n, rnd.nextLong(n).abs % n)
    }.filter { case (a, b) => a != b }
    val cut = 120L
    val (oldE, newE) = all.partition { case (a, b) => a < cut && b < cut }
    val ids = (0L until n).toDF("id")
    val oldLabels = TextDedup.clusters(
      (0L until cut).toDF("id"), oldE.toDF("a", "b"))
      .toDF("id", "cl")
    val star = oldLabels.filter(col("id") =!= col("cl"))
      .select(col("id").as("a"), col("cl").as("b"))
    val merged = TextDedup.clusters(ids,
      star.unionByName(newE.toDF("a", "b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = TextDedup.clusters(ids, all.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == full)
  }

  test("clusters over planted minhash pairs keep one doc per dup group") {
    val pairs = TextDedup.minhashDedup(corpus, "doc_id", "text",
      threshold = 0.5).select("a", "b")
    val ids = corpus.select("doc_id")
    val cl = TextDedup.clusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the near-dup family {0,1,2} collapses to keeper 0; doc 4's
    // double spaces perturb its raw-token shingles (empty tokens), so
    // minhash banding may miss it — that duplicate is exact-dedup's
    // job via whitespace normalization (covered above)
    assert(cl(0L) == 0L && cl(1L) == 0L && cl(2L) == 0L)
    assert(cl(3L) == 3L && cl(5L) == 5L)
  }

  // A planted mega-bucket: 1,000 byte-identical boilerplate docs whose
  // band buckets (all three) blow past the cap, plus one genuine exact
  // pair that must survive capping untouched.
  private def megaBucketCorpus = {
    import spark.implicits._
    val boiler = (100L until 1100L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
    val real = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river"),
      (1L, "the quick brown fox jumps over the lazy dog near the river"))
    (boiler ++ real).toDF("doc_id", "text")
  }

  test("hot-bucket cap drops the planted mega-bucket; genuine pairs survive") {
    val df = megaBucketCorpus
    val sh = TextDedup.shingles(df, "doc_id", "text", 3)
    val bands = TextDedup.lshBands(
      TextDedup.minhashSignatures(sh, "doc_id", 6), "doc_id", 6, 3).persist()
    try {
      // the audit twin surfaces exactly the three over-cap band buckets
      val over = TextDedup
        .overCapBuckets(bands, Seq("band_idx", "band_val"), 100)
        .collect()
      assert(over.length == 3)
      assert(over.forall(_.getAs[Long]("n_members") == 1000L))
      // capped: only the genuine pair — not 3 × C(1000,2) boilerplate
      val capped = TextDedup.lshCandidates(bands, "doc_id", maxBucket = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped == Set((0L, 1L)))
      // explicitly uncapped keeps the mega-bucket (candidates include
      // boilerplate pairs) — the cap, not the data, removed them
      val uncapped = TextDedup
        .lshCandidates(bands.filter(col("band_idx") === 0), "doc_id",
          maxBucket = Int.MaxValue)
      assert(uncapped.count() == 1000L * 999 / 2 + 1)
    } finally bands.unpersist()
  }

  test("sub-banding bounds the mega-bucket but still yields pairs inside it") {
    val df = megaBucketCorpus
    val sh = TextDedup.shingles(df, "doc_id", "text", 3)
    val bands = TextDedup.lshBands(
      TextDedup.minhashSignatures(sh, "doc_id", 6), "doc_id", 6, 3).persist()
    try {
      val maxBucket = 100
      val sub = TextDedup.lshCandidatesSubBanded(bands, "doc_id", maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the genuine pair survives (its bucket is under-cap, shard 0)
      assert(sub.contains((0L, 1L)))
      // boilerplate pairs ARE mined — capBuckets would have dropped
      // them all — but only within shards, so bounded:
      // 3 bands x 10 shards x C(~100,2) << 3 x C(1000,2)
      val boilerPairs = sub.count { case (a, b) => a >= 100L && b >= 100L }
      assert(boilerPairs > 0, "sub-banding lost the whole mega-bucket")
      val unboundedPerBand = 1000L * 999 / 2
      assert(boilerPairs < unboundedPerBand / 5,
        s"sub-banding did not bound the mega-bucket: $boilerPairs pairs")
      // shard assignment is deterministic (hash of the id, no rand())
      val again = TextDedup.lshCandidatesSubBanded(bands, "doc_id", maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(again == sub)
    } finally bands.unpersist()
  }

  test("simhashPairs honors the hot-bucket cap") {
    val sim = TextDedup.simhash(megaBucketCorpus, "doc_id", "text").persist()
    try {
      val capped = TextDedup
        .simhashPairs(sim, "doc_id", maxHamming = 1, maxBucket = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped == Set((0L, 1L)))
    } finally sim.unpersist()
  }

  test("bucket cap never re-shuffles the banded rows") {
    val df = megaBucketCorpus
    val sh = TextDedup.shingles(df, "doc_id", "text", 3)
    // persisted, as in minhashDedup: the cap's fan-out reads the cache
    val bands = TextDedup.lshBands(
      TextDedup.minhashSignatures(sh, "doc_id", 6), "doc_id", 6, 3).persist()
    try {
      bands.count()
      // count executed shuffle nodes via tree traversal: the plan
      // STRING re-prints each InMemoryRelation's internal exchanges at
      // every cache reference, which would overcount cache reads
      def shuffleExchanges(d: org.apache.spark.sql.DataFrame): Int =
        d.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.length
      val plain = TextDedup.lshCandidates(bands, "doc_id",
        maxBucket = Int.MaxValue)
      val capped = TextDedup.lshCandidates(bands, "doc_id", maxBucket = 100)
      // the cap's only new shuffles are the per-bucket count aggregates
      // (one row per distinct bucket key, map-side combined; one per
      // self-join side); the over-cap list is removed via broadcast
      // anti-join, so the banded rows keep the exact exchange plan they
      // had without a cap
      assert(shuffleExchanges(capped) <= shuffleExchanges(plain) + 2,
        "cap re-shuffled more than the per-bucket count aggregates")
      val plan = capped.queryExecution.executedPlan.toString
      assert(plan.contains("LeftAnti, BuildRight"),
        "over-cap bucket removal is not a broadcast anti-join")
    } finally bands.unpersist()
  }

  // The closest local proxy for the 100× scale claim (no sf1 testdata
  // exists): 16 shifted copies of the real 500-doc corpus — every doc
  // becomes a 16-member exact-dup family — through the full
  // minhash → verify → cluster pipeline. Pins that the plan keeps its
  // bucketed shape under heavy duplication (no nested-loop/cartesian
  // fallback) and that clustering converges with every family intact.
  test("scale stress: 16x self-union corpus keeps the bucketed plan and clusters every family") {
    val n = 16
    val docs0 = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val big = (0 until n).map(i =>
        docs0.select((col("doc_id") * n + i).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    val pairs = TextDedup.minhashDedup(big, "doc_id", "text",
      shingleN = 3, numHashes = 6, bands = 3, threshold = 0.8)
      .select("a", "b").persist()
    try {
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"dup-heavy corpus degraded the LSH join:\n$plan")
      // every family of 16 exact copies must land in one cluster
      // (cross-family merges from genuinely similar texts are allowed)
      val perFamily = TextDedup.clusters(big.select("doc_id"), pairs)
        .toDF("doc_id", "cluster_id")
        .groupBy((col("doc_id") / n).cast("long").as("family"))
        .agg(countDistinct(col("cluster_id")).as("n_clusters"))
        .filter(col("n_clusters") > 1)
        .count()
      assert(perFamily == 0L, s"$perFamily families split across clusters")
    } finally pairs.unpersist()
  }

  test("verifiedJaccard brute force ranks the near-dup closest") {
    val sh = TextDedup.shingles(corpus, "doc_id", "text", 2)
    val all = TextDedup.verifiedJaccard(sh, "doc_id", cand = null, 0.0)
      .filter(col("a") === 0L).orderBy(col("jaccard").desc).collect()
    assert(all.head.getAs[Long]("b") == 1L || all.head.getAs[Long]("b") == 4L)
    assert(all.head.getAs[Double]("jaccard") == 1.0)
  }

  test("clusters over a UNION of modality edge sets bridge across " +
    "modalities (the q_hybrid_cluster semantics)") {
    import spark.implicits._
    // text modality links 1-2; embedding modality links 2-3: the union
    // must produce ONE cluster {1,2,3} even though neither modality
    // alone connects 1 to 3; 4 stays isolated
    val ids = Seq(1L, 2L, 3L, 4L).toDF("id")
    val textPairs = Seq((1L, 2L)).toDF("a", "b")
    val embPairs = Seq((2L, 3L)).toDF("a", "b")
    val edges = textPairs.unionByName(embPairs).distinct()
    val out = TextDedup.clusters(ids, edges)
      .toDF("id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("containmentPairs finds the near-superset that Jaccard-LSH misses") {
    import spark.implicits._
    val big = (1 to 30).map(i => s"w$i").mkString(" ")   // 28 shingles
    val small = (1 to 6).map(i => s"w$i").mkString(" ")  // 4, all ⊂ big
    val docs = Seq((1L, big), (2L, small), (3L, "x1 x2 x3 x4 x5 x6"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.containmentPairs(docs, "doc_id", "text",
      minContainment = 0.99, maxPosting = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6))))
      .toMap
    // the contained doc scores cont_b = 1.0; the unrelated doc pairs
    // with nothing (no shared shingle, no candidate row at all)
    assert(pairs.keySet == Set((1L, 2L)))
    assert(pairs((1L, 2L)) == ((4L, 28L, 4L, 1.0)))
    // the same pair is invisible to symmetric minhash dedup at 0.8:
    // J = 4/28 — this is exactly why the operator exists
    assert(TextDedup.minhashDedup(docs, "doc_id", "text",
      maxBucket = Int.MaxValue).isEmpty)
  }

  test("containmentPairs caps hot shingle postings like LSH buckets") {
    import spark.implicits._
    // 20 docs all sharing one hot shingle; cap 5 drops that posting
    // entirely -> no pairs survive (exact behavior of capBuckets)
    val docs = (1 to 20).map(i => (i.toLong, "h1 h2 h3")).toDF("doc_id", "text")
    val capped = TextDedup.containmentPairs(docs, "doc_id", "text",
      minContainment = 0.5, maxPosting = 5)
    assert(capped.isEmpty)
    val uncapped = TextDedup.containmentPairs(docs, "doc_id", "text",
      minContainment = 0.5, maxPosting = Int.MaxValue)
    assert(uncapped.count() == 190L) // C(20,2) identical docs
  }

  test("batch and streaming minhash signatures agree slot for slot") {
    // the digest-packed slot layout (four 8-hex-char minhashes per
    // md5) must stay in lockstep between TextDedup.minhashSignatures
    // (Column form) and StreamDedup.minhashSignature (local form) —
    // the streamed near-dup pairs hash-compare against the batch
    // oracle, so silent drift here would break q_stream_neardup
    import spark.implicits._
    val texts = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river"),
      (1L, "pack my box with five dozen liquor jugs for the long trip"),
      (2L, "a b c")) // exactly shingleN tokens: single-shingle edge
    val df = texts.toDF("doc_id", "text")
    val sh = TextDedup.shingles(df, "doc_id", "text", 3)
    val batch = TextDedup.minhashSignatures(sh, "doc_id", 6)
      .collect()
      .map(r => r.getLong(0) -> (0 until 6).map(k => r.getString(k + 1)))
      .toMap
    texts.foreach { case (id, text) =>
      val local = graft.streaming.StreamDedup
        .minhashSignature(text, shingleN = 3, numHashes = 6)
      assert(local.isDefined, s"doc $id lost its signature")
      assert(local.get == batch(id),
        s"doc $id: streaming ${local.get} != batch ${batch(id)}")
    }
    // every slot is an 8-hex-char string (the packed layout), not a
    // full 32-char digest
    assert(batch.values.flatten.forall(s =>
      s.length == 8 && s.forall(c => c.isDigit || ('a' to 'f').contains(c))))
  }

  test("substringRemovalPlan: planted shared span yields one merged interval per doc") {
    import spark.implicits._
    // a 10-char span "0123456789" shared verbatim by docs 0 and 1 at
    // different offsets; the rest of each doc is unique (distinct
    // character sets), so only grams inside the span repeat
    val df = Seq(
      (0L, "aaaaabbbbb0123456789cccccddddd"),
      (1L, "eeeeefffff__0123456789ggggghhh"),
      (2L, "iiiiijjjjjkkkkklllllmmmmmnnnnn"))
      .toDF("doc_id", "text")
    val plan = TextDedup.substringRemovalPlan(df, "doc_id", "text",
      gramLen = 10, minCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2))
    // exactly the planted span, 1-based, end exclusive: doc 0 at
    // offset 11, doc 1 at offset 13; doc 2 untouched. A single
    // 10-gram matches only the exact span, so merge is the identity —
    // the point is that NO unique text leaks into the cut set.
    assert(plan.toSeq == Seq((0L, 11, 21), (1L, 13, 23)))
    // overlap merge: two shared grams overlapping by 5 chars fuse
    val df2 = Seq(
      (0L, "xx_SHAREDAAAA_yyzz"), (1L, "qq_SHAREDAAAA_wwvv"))
      .toDF("doc_id", "text")
    val plan2 = TextDedup.substringRemovalPlan(df2, "doc_id", "text",
      gramLen = 6, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2))
    // shared region "_sharedaaaa_" (lowercased) spans cols 3..14: its
    // 6-grams at offsets 3..9 all repeat, merging to [3, 15)
    assert(plan2.toSeq == Seq((0L, 3, 15), (1L, 3, 15)))
  }

  test("substringRemovalPlan equals the brute-force covered-span union on a seeded corpus") {
    import spark.implicits._
    val L = 5
    // deterministic low-entropy corpus: plenty of genuine cross- and
    // within-doc gram repeats
    val rng = new scala.util.Random(42)
    val texts = (0L until 30L).map { id =>
      id -> (0 until (20 + rng.nextInt(40)))
        .map(_ => "abc".charAt(rng.nextInt(3))).mkString
    }
    val got = TextDedup.substringRemovalPlan(
      texts.toDF("doc_id", "text"), "doc_id", "text",
      gramLen = L, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSet
    // brute force: duplicated grams -> covered position union ->
    // maximal runs as intervals (1-based, end exclusive)
    val grams = texts.flatMap { case (id, t0) =>
      val t = t0.toLowerCase.trim
      if (t.length < L) Nil
      else (0 to t.length - L).map(i => (id, i + 1, t.substring(i, i + L)))
    }
    val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expected = grams.filter(g => dup(g._3))
      .groupBy(_._1).flatMap { case (id, hs) =>
        val covered = hs.flatMap(h => h._2 until h._2 + L).toSet
        val runs = scala.collection.mutable.Buffer.empty[(Long, Int, Int)]
        val sorted = covered.toSeq.sorted
        var start = -1; var prev = -2
        sorted.foreach { p =>
          if (p != prev + 1) { if (start >= 0) runs += ((id, start, prev + 1)); start = p }
          prev = p
        }
        if (start >= 0) runs += ((id, start, prev + 1))
        runs
      }.toSet
    assert(got == expected,
      s"plan mismatch: extra=${got -- expected} missing=${expected -- got}")
  }

  test("prefixJaccardPairs: lossless and exact vs brute force under fuzz") {
    // the PPJoin prefix rule's completeness proof is easy to break
    // off-by-one (prefix length, the length prune, tie order) — fuzz
    // random corpora against a driver-side all-pairs reference over
    // the SAME shingle definition
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c", "d", "e")
    val genDoc = for {
      len <- Gen.choose(2, 12) // includes < shingleN docs (excluded sets)
      ws <- Gen.listOfN(len, Gen.oneOf(alpha))
    } yield ws.mkString(" ")
    val genCorpus = for {
      n <- Gen.choose(4, 14)
      docs <- Gen.listOfN(n, genDoc)
      tau <- Gen.oneOf(0.5, 0.7, 0.8, 0.9)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, tau)
    new PropHelpers {}.forAll(genCorpus, n = 12) { case (rows, tau) =>
      val df = rows.toDF("doc_id", "text")
      val got = TextDedup.prefixJaccardPairs(df, "doc_id", "text",
          shingleN = 3, threshold = tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      val sets = rows.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).sliding(3)
          .filter(_.size == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
      val expected = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        i = (sa & sb).size
        if i > 0 && i.toDouble / (sa.size + sb.size - i) >= tau
      } yield (a, b, i.toLong, sa.size.toLong, sb.size.toLong)).toSet
      assert(got == expected,
        s"tau=$tau extra=${got -- expected} missing=${expected -- got}")
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("prefixJaccardPairsCapped: emitted pairs are always a subset of " +
      "exact truth with true Jaccard; a non-tripping cap loses nothing") {
    // the capped twin's contract under fuzz: precision is NEVER traded
    // (survivors verify against full shingle sets), recall only drops
    // via dropped hot postings — and with the cap above every posting
    // the result equals the lossless join bit-for-bit
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c")
    val genDoc = for {
      len <- Gen.choose(2, 10)
      ws <- Gen.listOfN(len, Gen.oneOf(alpha))
    } yield ws.mkString(" ")
    val genCorpus = for {
      n <- Gen.choose(4, 12)
      docs <- Gen.listOfN(n, genDoc)
      tau <- Gen.oneOf(0.5, 0.8)
      cap <- Gen.choose(1, 4)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      tau, cap)
    new PropHelpers {}.forAll(genCorpus, n = 6) { case (rows, tau, cap) =>
      val df = rows.toDF("doc_id", "text")
      def collectPairs(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      val sets = rows.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).sliding(3)
          .filter(_.size == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
      val exact = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        i = (sa & sb).size
        if i > 0 && i.toDouble / (sa.size + sb.size - i) >= tau
      } yield (a, b, i.toLong, sa.size.toLong, sb.size.toLong)).toSet
      val (capped, over) = TextDedup.prefixJaccardPairsCapped(
        df, "doc_id", "text", shingleN = 3, threshold = tau,
        maxPrefixPosting = cap)
      val got = collectPairs(capped)
      // subset with TRUE stats: every emitted pair exists in truth
      // with identical inter/sizes (precision + exact verification)
      assert((got -- exact).isEmpty,
        s"tau=$tau cap=$cap false positives: ${got -- exact}")
      // nothing dropped ⇒ nothing lost
      if (over.isEmpty) assert(got == exact,
        s"tau=$tau cap=$cap empty audit but missing: ${exact -- got}")
      graft.ops.QueryCaches.releaseAll()
      // a cap no posting reaches reproduces the lossless join exactly
      val (full, over2) = TextDedup.prefixJaccardPairsCapped(
        df, "doc_id", "text", shingleN = 3, threshold = tau,
        maxPrefixPosting = 10000)
      assert(over2.isEmpty, s"cap=10000 still dropped postings")
      assert(collectPairs(full) == exact, s"tau=$tau high-cap mismatch")
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("prefixJaccardAgainst: cross-side lossless and exact vs brute " +
      "force under fuzz") {
    // the cross-side prefix rule shares the within-corpus theorem but
    // its own failure modes: a rank computed over one side only, side
    // mix-ups in the verify joins, id collisions across sides
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c", "d", "e")
    val genDoc = for {
      len <- Gen.choose(2, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(alpha))
    } yield ws.mkString(" ")
    val genCorpus = for {
      nc <- Gen.choose(3, 8)
      nb <- Gen.choose(3, 8)
      cd <- Gen.listOfN(nc, genDoc)
      bd <- Gen.listOfN(nb, genDoc)
      tau <- Gen.oneOf(0.5, 0.7, 0.8, 0.9)
    } yield (cd.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      // batch ids deliberately OVERLAP corpus ids (0-based too): the
      // side tag must keep them apart
      bd.zipWithIndex.map { case (t, i) => (i.toLong, t) }, tau)
    new PropHelpers {}.forAll(genCorpus, n = 12) { case (crows, brows, tau) =>
      val got = TextDedup.prefixJaccardAgainst(
          crows.toDF("doc_id", "text"), brows.toDF("doc_id", "text"),
          "doc_id", "text", shingleN = 3, threshold = tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      def sets(rows: Seq[(Long, String)]) = rows.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).sliding(3)
          .filter(_.size == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
      val expected = (for {
        (b, sb) <- sets(brows); (c, sc) <- sets(crows)
        i = (sb & sc).size
        if i > 0 && i.toDouble / (sb.size + sc.size - i) >= tau
      } yield (b, c, i.toLong, sb.size.toLong, sc.size.toLong)).toSet
      assert(got == expected,
        s"tau=$tau extra=${got -- expected} missing=${expected -- got}")
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("prefixJaccardPairs: hot-posting audit fails loudly on a " +
      "degenerate corpus; capped twin bounds fan-out and stays exact") {
    // the degenerate shape the audit exists for: tiny documents made
    // ONLY of one globally-common shingle — every doc's prefix is its
    // whole (1-shingle) set, so that shingle's prefix posting holds
    // the entire corpus and the candidate join would fan out
    // quadratically on it
    import spark.implicits._
    val degenerate = (0L until 40L).map(i => (i, "x x x")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      TextDedup.prefixJaccardPairs(degenerate, "doc_id", "text",
        shingleN = 3, threshold = 0.8, maxPrefixPosting = 16)
    }
    assert(ex.getMessage.contains("prefix posting"), ex.getMessage)
    assert(ex.getMessage.contains("40 members"), ex.getMessage)
    graft.ops.QueryCaches.releaseAll()

    // the cross-side variant runs the same audit over the UNION
    // posting (that union is what its candidate join fans out on)
    val exIncr = intercept[IllegalArgumentException] {
      TextDedup.prefixJaccardAgainst(
        degenerate.filter(col("doc_id") < 20),
        degenerate.filter(col("doc_id") >= 20),
        "doc_id", "text", shingleN = 3, threshold = 0.8,
        maxPrefixPosting = 16)
    }
    assert(exIncr.getMessage.contains("prefix posting"), exIncr.getMessage)
    assert(exIncr.getMessage.contains("corpus+batch"), exIncr.getMessage)
    graft.ops.QueryCaches.releaseAll()

    // the audited-lossless run passes untouched corpora at the same
    // bound (worst posting there is far under it)
    val normal = Seq(
      (0L, "a b c d e f"), (1L, "a b c d e f"),
      (2L, "p q r s t u"), (3L, "p q r s t u v"),
      (4L, "m n o m n o")).toDF("doc_id", "text")
    val audited = TextDedup.prefixJaccardPairs(normal, "doc_id", "text",
      shingleN = 3, threshold = 0.8, maxPrefixPosting = 16)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(audited == Set((0L, 1L), (2L, 3L)), audited)
    graft.ops.QueryCaches.releaseAll()

    // capped twin on the degenerate corpus: candidate fan-out is cut
    // (the hot posting drops — pairs are missed, the documented recall
    // trade), the audit frame names exactly what was dropped, and
    // nothing errors
    val (pairs, over) = TextDedup.prefixJaccardPairsCapped(degenerate,
      "doc_id", "text", shingleN = 3, threshold = 0.8,
      maxPrefixPosting = 16)
    assert(pairs.count() == 0L)
    val dropped = over.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dropped.toSeq == Seq(("x x x", 40L)), dropped.toSeq)
    graft.ops.QueryCaches.releaseAll()

    // capped twin under a NON-tripping cap equals the lossless join —
    // the GateScale.uncapped mirror property
    val (p2, o2) = TextDedup.prefixJaccardPairsCapped(normal,
      "doc_id", "text", shingleN = 3, threshold = 0.8,
      maxPrefixPosting = 16)
    assert(o2.count() == 0L)
    val got2 = p2.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((0L, 1L), (2L, 3L)), got2)
    graft.ops.QueryCaches.releaseAll()
  }

  private def dropIndex(tp: String): Unit =
    Seq("_rank", "_pref", "_sh", "_meta").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS $tp$sfx"))

  private def scratch(tp: String): String =
    Tables.scratchDir(spark, tp).toString

  test("indexed PPJoin equals the re-ranking variant under fuzz, " +
      "including batch shingles absent from the corpus") {
    // the production twin's frozen-corpus-rank contract: new batch
    // shingles order FIRST by shingle among themselves, corpus
    // prefixes stay valid — any off-by-one there silently drops cross
    // pairs. Batch docs draw from a WIDER alphabet (z tokens) so
    // unseen shingles occur in every sample; ids overlap across sides.
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c", "d", "e")
    def genDoc(v: Vector[String]) = for {
      len <- Gen.choose(2, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(v))
    } yield ws.mkString(" ")
    val genCorpus = for {
      nc <- Gen.choose(3, 8)
      nb <- Gen.choose(3, 8)
      cd <- Gen.listOfN(nc, genDoc(alpha))
      bd <- Gen.listOfN(nb, genDoc(alpha :+ "z"))
      tau <- Gen.oneOf(0.5, 0.8)
    } yield (cd.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      bd.zipWithIndex.map { case (t, i) => (i.toLong, t) }, tau)
    val tp = "graft_ppjidx_fuzz"
    try {
      new PropHelpers {}.forAll(genCorpus, n = 6) { case (crows, brows, tau) =>
        val cdf = crows.toDF("doc_id", "text")
        val bdf = brows.toDF("doc_id", "text")
        TextDedup.writePrefixIndex(cdf, "doc_id", "text", tp,
          buckets = 4, shingleN = 3, threshold = tau,
          pathPrefix = Some(scratch(tp)))
        def collectPairs(d: org.apache.spark.sql.DataFrame) = d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
          .toSet
        val got = collectPairs(TextDedup.prefixJaccardAgainstIndexed(
          spark, tp, bdf, "doc_id", "text", shingleN = 3, threshold = tau))
        val expected = collectPairs(TextDedup.prefixJaccardAgainst(
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

  test("appendPrefixIndex: appended docs participate exactly under " +
      "the frozen rank, including shingles the rank never saw") {
    // the lifecycle contract: build(c1) + append(c2) must answer
    // queries exactly like a fresh union index — even when c2 and the
    // batch both carry shingles absent from c1's frozen rank (they
    // order first-by-shingle for EVERY participant, so all stored
    // prefixes stay true prefixes of the one total order)
    import spark.implicits._
    import org.scalacheck.Gen
    val alpha = Vector("a", "b", "c", "d", "e")
    def genDoc(v: Vector[String]) = for {
      len <- Gen.choose(2, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(v))
    } yield ws.mkString(" ")
    val genCorpus = for {
      n1 <- Gen.choose(3, 6)
      n2 <- Gen.choose(3, 6)
      nb <- Gen.choose(3, 8)
      c1 <- Gen.listOfN(n1, genDoc(alpha))
      c2 <- Gen.listOfN(n2, genDoc(alpha :+ "y")) // unseen vs c1
      bd <- Gen.listOfN(nb, genDoc(alpha ++ Vector("y", "z")))
      tau <- Gen.oneOf(0.5, 0.8)
    } yield (c1.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      c2.zipWithIndex.map { case (t, i) => (100L + i, t) },
      bd.zipWithIndex.map { case (t, i) => (i.toLong, t) }, tau)
    val tp = "graft_ppjapp_fuzz"
    try {
      new PropHelpers {}.forAll(genCorpus, n = 5) {
        case (c1, c2, brows, tau) =>
          val c1df = c1.toDF("doc_id", "text")
          val c2df = c2.toDF("doc_id", "text")
          val bdf = brows.toDF("doc_id", "text")
          TextDedup.writePrefixIndex(c1df, "doc_id", "text", tp,
            buckets = 4, shingleN = 3, threshold = tau,
            pathPrefix = Some(scratch(tp)))
          TextDedup.appendPrefixIndex(spark, tp, c2df, "doc_id", "text",
            buckets = 4, shingleN = 3, threshold = tau)
          def collectPairs(d: org.apache.spark.sql.DataFrame) = d.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4)))
            .toSet
          val got = collectPairs(TextDedup.prefixJaccardAgainstIndexed(
            spark, tp, bdf, "doc_id", "text", shingleN = 3,
            threshold = tau))
          val expected = collectPairs(TextDedup.prefixJaccardAgainst(
            c1df.unionAll(c2df), bdf, "doc_id", "text", shingleN = 3,
            threshold = tau))
          assert(got == expected,
            s"tau=$tau extra=${got -- expected} missing=${expected -- got}")
          graft.ops.QueryCaches.releaseAll()
      }
    } finally {
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("indexed PPJoin: all-new-shingle batch docs, a looser build " +
      "threshold stays lossless, build-time audit fails loudly") {
    import spark.implicits._
    val corpusDf = Seq(
      (0L, "a b c d e f"), (1L, "p q r s t u"), (2L, "m n o w x y"))
      .toDF("doc_id", "text")
    val batchDf = Seq(
      (0L, "a b c d e f g"),     // near-dup of corpus 0 (id collides)
      (10L, "z1 z2 z3 z4 z5"),   // every shingle absent from the corpus
      (11L, "p q r s t u"))      // exact dup of corpus 1
      .toDF("doc_id", "text")
    val tp = "graft_ppjidx_hand"
    try {
      // build at tau=0.5, query at 0.8: stored prefixes are LONGER
      // than the nightly cut needs — over-inclusive, never lossy
      TextDedup.writePrefixIndex(corpusDf, "doc_id", "text", tp,
        buckets = 4, shingleN = 3, threshold = 0.5,
        pathPrefix = Some(scratch(tp)))
      val got = TextDedup.prefixJaccardAgainstIndexed(spark, tp, batchDf,
          "doc_id", "text", shingleN = 3, threshold = 0.8)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // (0, 0): J = 4/6 < 0.8? shingles(corpus 0) = 4, shingles(batch
      // 0) = 5, inter 4, J = 4/5... = 0.8 — qualifies; (11, 1) exact
      assert(got == Set((0L, 0L), (11L, 1L)), got)
      graft.ops.QueryCaches.releaseAll()

      // the all-absent batch doc generated no candidates, and the
      // batch-side audit sees only batch-sized postings
      val got2 = TextDedup.prefixJaccardAgainstIndexed(spark, tp, batchDf,
        "doc_id", "text", shingleN = 3, threshold = 0.8,
        maxPrefixPosting = 16)
      assert(got2.count() == 2L)
      graft.ops.QueryCaches.releaseAll()
    } finally {
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }

    // build-time hot-posting audit: the degenerate corpus fails at
    // INDEX BUILD, naming the posting — not at 3am in the nightly
    import spark.implicits._
    val degenerate = (0L until 30L).map(i => (i, "x x x"))
      .toDF("doc_id", "text")
    val tp2 = "graft_ppjidx_degen"
    try {
      val ex = intercept[IllegalArgumentException] {
        TextDedup.writePrefixIndex(degenerate, "doc_id", "text", tp2,
          buckets = 4, shingleN = 3, threshold = 0.8,
          pathPrefix = Some(scratch(tp2)), maxPrefixPosting = 16)
      }
      assert(ex.getMessage.contains("corpus prefix posting"), ex.getMessage)
      assert(ex.getMessage.contains("30 members"), ex.getMessage)
    } finally {
      dropIndex(tp2)
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("prefix index _meta sidecar: reader and append reject a call " +
      "that violates the build contract") {
    // the VERDICT-r17 gap: τ' < τ_build silently LOSES pairs (stored
    // prefixes are too short) — the sidecar turns that into a loud
    // rejection instead of a contract in the caller's head
    import spark.implicits._
    val corpusDf = Seq(
      (0L, "a b c d e f"), (1L, "p q r s t u")).toDF("doc_id", "text")
    val batchDf = Seq((10L, "a b c d e f g")).toDF("doc_id", "text")
    val tp = "graft_ppjidx_meta"
    try {
      TextDedup.writePrefixIndex(corpusDf, "doc_id", "text", tp,
        buckets = 4, shingleN = 3, threshold = 0.8,
        pathPrefix = Some(scratch(tp)))
      // the sidecar carries the build contract
      val m = spark.table(s"${tp}_meta").collect().head
      assert(m.getDouble(m.fieldIndex("tau_build")) == 0.8)
      assert(m.getInt(m.fieldIndex("shingle_n")) == 3)
      assert(m.getInt(m.fieldIndex("buckets")) == 4)
      // reader at a LOOSER τ: lossy by construction -> rejected
      val e1 = intercept[IllegalArgumentException] {
        TextDedup.prefixJaccardAgainstIndexed(spark, tp, batchDf,
          "doc_id", "text", shingleN = 3, threshold = 0.5)
      }
      assert(e1.getMessage.contains("build threshold 0.8"), e1.getMessage)
      // reader with a mismatched shingleN: different feature space
      val e2 = intercept[IllegalArgumentException] {
        TextDedup.prefixJaccardAgainstIndexed(spark, tp, batchDf,
          "doc_id", "text", shingleN = 2, threshold = 0.8)
      }
      assert(e2.getMessage.contains("shingleN"), e2.getMessage)
      // append at a different τ: wrong prefix cut for stored readers
      val e3 = intercept[IllegalArgumentException] {
        TextDedup.appendPrefixIndex(spark, tp, batchDf, "doc_id", "text",
          buckets = 4, shingleN = 3, threshold = 0.9)
      }
      assert(e3.getMessage.contains("build"), e3.getMessage)
      // append with mismatched buckets
      val e4 = intercept[IllegalArgumentException] {
        TextDedup.appendPrefixIndex(spark, tp, batchDf, "doc_id", "text",
          buckets = 8, shingleN = 3, threshold = 0.8)
      }
      assert(e4.getMessage.contains("buckets"), e4.getMessage)
      // the matching call still works end-to-end
      val ok = TextDedup.prefixJaccardAgainstIndexed(spark, tp, batchDf,
        "doc_id", "text", shingleN = 3, threshold = 0.8)
      assert(ok.count() >= 0L)
      graft.ops.QueryCaches.releaseAll()
    } finally {
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("indexed PPJoin reader audits the corpus postings the batch " +
      "touches — append drift trips it, untouched postings don't") {
    // the r17 'What's wrong': appendPrefixIndex grows corpus prefix
    // postings under the frozen rank with no tripwire — the reader
    // must fail loudly when tonight's batch touches a posting appends
    // have grown past the bound, and stay quiet when the hot posting
    // is never touched (the audit is batch-sized by design)
    import spark.implicits._
    val corpusDf = Seq(
      (0L, "a b c d e"), (1L, "p q r s t")).toDF("doc_id", "text")
    val tp = "graft_ppjidx_drift"
    try {
      TextDedup.writePrefixIndex(corpusDf, "doc_id", "text", tp,
        buckets = 4, shingleN = 3, threshold = 0.5,
        pathPrefix = Some(scratch(tp)), maxPrefixPosting = 16)
      // 30 appended near-identical docs: every one's prefix holds the
      // shingle 'x x x' -> its corpus posting grows to 30 > 16
      TextDedup.appendPrefixIndex(spark, tp,
        (100L until 130L).map(i => (i, "x x x x")).toDF("doc_id", "text"),
        "doc_id", "text", buckets = 4, shingleN = 3, threshold = 0.5)
      // a batch that TOUCHES the grown posting trips the audit
      val hot = Seq((500L, "x x x y")).toDF("doc_id", "text")
      val ex = intercept[IllegalArgumentException] {
        TextDedup.prefixJaccardAgainstIndexed(spark, tp, hot,
          "doc_id", "text", shingleN = 3, threshold = 0.5,
          maxPrefixPosting = 16)
      }
      assert(ex.getMessage.contains("batch-touched shingle 'x x x'"),
        ex.getMessage)
      assert(ex.getMessage.contains("appends have grown"), ex.getMessage)
      graft.ops.QueryCaches.releaseAll()
      // a batch that avoids it passes — and still answers exactly
      val cold = Seq((501L, "a b c d e f")).toDF("doc_id", "text")
      val got = TextDedup.prefixJaccardAgainstIndexed(spark, tp, cold,
          "doc_id", "text", shingleN = 3, threshold = 0.5,
          maxPrefixPosting = 16)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((501L, 0L)), got)
      graft.ops.QueryCaches.releaseAll()
    } finally {
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("sharded prefix index: reader prunes corpus directories the " +
      "batch never touches, stays exact, and appends land in-shard") {
    // the sublinear-nightly path (VERDICT r17 #4): _rank/_pref gain
    // hive shard directories on hash(shingle); a batch touching few
    // shingles must read few directories — measured here via the
    // executed scan's numFiles metric — while answering exactly the
    // re-ranking variant's cross pairs
    import spark.implicits._
    // 40 corpus docs over DISJOINT per-doc alphabets -> shingles
    // spread across shards; each doc contributes distinct shingles
    val corpusDf = (0L until 40L)
      .map(i => (i, s"c${i}a c${i}b c${i}c c${i}d c${i}e"))
      .toDF("doc_id", "text")
    // the batch matches doc 7 only -> touches only doc 7's shingles
    val batchDf = Seq((100L, "c7a c7b c7c c7d c7e f"))
      .toDF("doc_id", "text")
    val tp = "graft_ppjidx_shard"
    try {
      TextDedup.writePrefixIndex(corpusDf, "doc_id", "text", tp,
        buckets = 2, shingleN = 3, threshold = 0.5,
        pathPrefix = Some(scratch(tp)), shardBy = 16)
      val out = TextDedup.prefixJaccardAgainstIndexed(spark, tp, batchDf,
        "doc_id", "text", shingleN = 3, threshold = 0.5)
      val got = out.select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = TextDedup.prefixJaccardAgainst(corpusDf, batchDf,
          "doc_id", "text", shingleN = 3, threshold = 0.5)
        .select("a", "b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected && got == Set((100L, 7L)), s"$got vs $expected")
      // measured pruning: the executed _pref scan read fewer files
      // than the table holds (whole directories skipped). AQE hides
      // executed subtrees under query stages — walk the plan STRING
      // for the scan's partition filter, and the metric via a fresh
      // non-AQE count
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val allFiles = spark.table(s"${tp}_pref").inputFiles.length
        val prunedScan = TextDedup.prefixJaccardAgainstIndexed(spark, tp,
          batchDf, "doc_id", "text", shingleN = 3, threshold = 0.5)
        prunedScan.collect()
        // the candidate frame is op-internally persisted, so the
        // corpus scans hide behind InMemoryTableScan leaves — recurse
        // relation.cachedPlan (the WindowAudit rule)
        def fileScans(p: org.apache.spark.sql.execution.SparkPlan,
            tag: String): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
          p.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec
                if f.toString.contains(tag) => Seq(f)
            case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
              fileScans(m.relation.cachedPlan, tag)
            // a cache built by an earlier AQE-on call wraps its plan
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              fileScans(a.executedPlan, tag)
            // AQE stages are leaves hiding their subtrees (CLAUDE.md)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              fileScans(q.plan, tag)
            case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
              fileScans(r.child, tag)
          }.flatten
        val scans =
          fileScans(prunedScan.queryExecution.executedPlan, s"${tp}_pref")
        assert(scans.nonEmpty, "no _pref scan found in the plan\n" +
          prunedScan.queryExecution.executedPlan.treeString.take(8000))
        assert(scans.forall(_.toString.contains("__shard")),
          "scan carries no __shard partition filter:\n" + scans.head)
        val read = scans.map(_.metrics("numFiles").value).max
        assert(read > 0 && read < allFiles,
          s"pruning read $read of $allFiles files — expected a strict cut")
        // the verify side prunes too: _sh directories outside the
        // candidate ids' shard set are never read (one candidate ->
        // one id shard of 16)
        val allSh = spark.table(s"${tp}_sh").inputFiles.length
        val shScans =
          fileScans(prunedScan.queryExecution.executedPlan, s"${tp}_sh")
        assert(shScans.nonEmpty, "no _sh scan found in the plan")
        val readSh = shScans.map(_.metrics("numFiles").value).max
        assert(readSh > 0 && readSh < allSh,
          s"_sh pruning read $readSh of $allSh files — expected a strict cut")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      graft.ops.QueryCaches.releaseAll()

      // appends land in their shingle's shard: extend with a doc that
      // near-dups a NEW alphabet, query it back exactly
      TextDedup.appendPrefixIndex(spark, tp,
        Seq((200L, "n1 n2 n3 n4 n5")).toDF("doc_id", "text"),
        "doc_id", "text", buckets = 2, shingleN = 3, threshold = 0.5)
      val got2 = TextDedup.prefixJaccardAgainstIndexed(spark, tp,
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

  test("indexed PPJoin: zero shuffle exchange above every corpus-side " +
      "bucketed scan") {
    // the index's whole point: the nightly pays batch-sized cost only
    // — the rank lookup, the candidate join, and the verify join all
    // read corpus tables pre-partitioned on their join keys. AQE off
    // for the inspection (stages hide subtrees — the CLAUDE.md rule);
    // auto-broadcast off so the corpus sides cannot dodge the check by
    // being gate-scale small.
    import spark.implicits._
    val corpusDf = (0L until 60L)
      .map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} t$i u$i"))
      .toDF("doc_id", "text")
    val batchDf = (0L until 20L)
      .map(i => (i + 100L, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} t$i u$i v$i"))
      .toDF("doc_id", "text")
    val tp = "graft_ppjidx_plan"
    try {
      TextDedup.writePrefixIndex(corpusDf, "doc_id", "text", tp,
        buckets = 4, shingleN = 3, threshold = 0.5,
        pathPrefix = Some(scratch(tp)))
      // append a second tranche BEFORE pinning: each append lands its
      // own per-bucket files, and multi-file buckets must keep the
      // zero-exchange property (they only cost the joiner a re-sort)
      TextDedup.appendPrefixIndex(spark, tp,
        (200L until 220L)
          .map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} p$i q$i"))
          .toDF("doc_id", "text"),
        "doc_id", "text", buckets = 4, shingleN = 3, threshold = 0.5)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = TextDedup.prefixJaccardAgainstIndexed(spark, tp, batchDf,
        "doc_id", "text", shingleN = 3, threshold = 0.5)
      // the corpus scans live under PERSISTED frames too (bpref reads
      // _rank) — recurse cached subtrees (the WindowAudit rule)
      import org.apache.spark.sql.execution.SparkPlan
      def fragments(p: SparkPlan): Seq[SparkPlan] =
        p +: p.collect {
          case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            fragments(s.relation.cachedPlan)
        }.flatten
      val names = Seq("_rank", "_pref", "_sh").map(tp + _)
      // a corpus-side shuffle = an exchange whose UNARY path down
      // reaches a corpus table scan without crossing a join — the
      // legitimate post-join shuffles (batch-sized rows that merely
      // CARRY corpus-derived columns) have a binary node on the path
      // only a real file scan counts as "the corpus table": an
      // InMemoryTableScan LEAF prints its whole cached subtree in
      // toString, so a substring probe on any leaf would flag the
      // batch-side caches whose lineage merely MENTIONS the tables
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
      // and the plan genuinely reads all three corpus tables
      val allStr = frs.map(_.toString).mkString("\n")
      names.foreach { n =>
        assert(allStr.contains(n), s"plan does not read $n:\n$allStr")
      }
      // the result is still right under these confs
      assert(out.count() > 0L)
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      dropIndex(tp)
      graft.ops.QueryCaches.releaseAll()
    }
  }
}
