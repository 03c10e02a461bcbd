package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Corpus

class CorpusSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stop = Seq("the", "a", "data", "row", "key")

  test("hashBucket is deterministic and lands in [0, 100)") {
    val df = (0L until 1000L).toDF("id")
      .withColumn("b", Corpus.hashBucket(col("id"), "smpl"))
    val again = (0L until 1000L).toDF("id")
      .withColumn("b", Corpus.hashBucket(col("id"), "smpl"))
    assert(df.exceptAll(again).isEmpty)
    assert(df.filter(col("b") < 0 || col("b") >= 100).count() == 0)
    // buckets actually spread (not a constant)
    assert(df.select("b").distinct().count() > 50)
  }

  test("hashBucket stays in range for extreme and negative ids") {
    val ids = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    val out = ids.toDF("id")
      .withColumn("b", Corpus.hashBucket(col("id"), "smpl"))
      .select("b").as[Long].collect()
    assert(out.forall(b => b >= 0 && b < 100))
  }

  test("hashSample keeps each stratum near its rate, deterministically") {
    val df = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val kept = Corpus.hashSample(df, "id", "lang",
      rates = Map("en" -> 50), defaultRate = 20)
    val byLang = kept.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    // 1000 candidates per stratum; md5 buckets are near-uniform
    assert(byLang("en") > 400 && byLang("en") < 600)
    assert(byLang("de") > 120 && byLang("de") < 280)
    // bucket always under the stratum rate
    assert(kept.filter(col("lang") === "en" && col("bucket") >= 50)
      .count() == 0)
    assert(kept.filter(col("lang") === "de" && col("bucket") >= 20)
      .count() == 0)
  }

  test("sampleExactPerStratum hits the quota exactly and is deterministic") {
    val df = ((0L until 15L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "small"))).toDF("doc_id", "source")
    def run() = Corpus.sampleExactPerStratum(df, "source", "doc_id", n = 5)
    val got = run().collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    // exact quota on the big stratum; the whole small stratum (< n)
    val bySrc = got.groupBy(_._1)
    assert(bySrc("big").length == 5)
    assert(bySrc("small").length == 3)
    // ranks are 1..k with no gaps, and the pick is retry-stable
    assert(bySrc("big").map(_._3).sorted.toSeq == (1L to 5L))
    assert(bySrc("small").map(_._3).sorted.toSeq == (1L to 3L))
    assert(run().exceptAll(run()).isEmpty)
  }

  test("contaminationReport sizes leakage per flagged doc only") {
    val benchmark = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      // 9 tokens → 5 distinct 5-grams; exactly one is the benchmark's
      (1L, "intro words alpha beta gamma delta epsilon closing remark"),
      // clean → must not appear at all
      (2L, "totally unrelated sentence about spark plans and shuffles"))
      .toDF("doc_id", "text")
    val got = Corpus.contaminationReport(
      train, benchmark, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 5L, 1L, 0.2)))
  }

  test("incrementalDedup drops batch docs the corpus already has") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha  beta"), // dup of corpus 1 after normalization
      (11L, "fresh text here"),
      (12L, "fresh text here"), // in-batch dup of 11
      (13L, "another new one"))
      .toDF("doc_id", "text")
    val out = Corpus.incrementalDedup(corpus, batch, "doc_id", "text")
      .select("keep_id", "n_batch").as[(Long, Long)].collect().toSet
    assert(out == Set((11L, 2L), (13L, 1L)))
  }

  test("bucketed incremental dedup matches the plain form with zero " +
    "exchange above the corpus scan") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha  beta"), // dup of corpus 1 after normalization
      (11L, "fresh text here"),
      (12L, "fresh text here"), // in-batch dup of 11
      (13L, "another new one"))
      .toDF("doc_id", "text")
    Corpus.writeCorpusFingerprints(corpus, "text", "corpus_fp_b", buckets = 4)
    try {
      // disable auto-broadcast so the anti-join would otherwise shuffle
      // both sides — the bucketed layout must carry the corpus side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Corpus.incrementalDedupBucketed(
        spark, "corpus_fp_b", batch, "doc_id", "text")
      val got = out.select("keep_id", "n_batch").as[(Long, Long)]
        .collect().toSet
      assert(got == Set((11L, 2L), (13L, 1L)))
      // zero-exchange pin: no shuffle node anywhere above the bucketed
      // fingerprint scan — only the batch aggregate side exchanges
      val shufflesOverScan = out.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.toString.contains("corpus_fp_b") => e
      }
      assert(shufflesOverScan.isEmpty,
        "bucketed corpus side still shuffles:\n" +
          out.queryExecution.executedPlan.toString)
      assert(out.queryExecution.executedPlan.toString.contains("corpus_fp_b"),
        "plan does not read the bucketed table")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS corpus_fp_b")
    }
  }

  test("curate rejects inputs whose columns collide with generated names") {
    val docs = Seq((1L, "x", "one two three four five six seven"))
      .toDF("doc_id", "fp", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.curate(docs, "doc_id", "text", stop)
    }
    assert(e.getMessage.contains("fp"))
  }

  test("curate applies quality gates then keeps min id per fingerprint") {
    val docs = Seq(
      (1L, "en", "web", "the data row key value here and more tokens"),
      (2L, "en", "web", "the  data row key value here and more tokens"), // dup of 1
      (3L, "en", "web", "short"), // fails minTokens/length
      (4L, "en", "web", "the the the the a a a a data data row row"), // stop_ratio 1.0
      (5L, "de", "web", "ein zwei drei vier funf sechs sieben acht"))
      .toDF("doc_id", "lang", "source", "text")
    val kept = Corpus.curate(docs, "doc_id", "text", stop)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L))
  }

  test("curate dedupes rows carrying a non-orderable (MapType) payload column") {
    // min(struct(ALL cols)) would fail analysis on the map column;
    // the min_by argmin orders by the id only (the ADVICE r13 case)
    val docs = Seq(
      (1L, Map("k" -> "v1"), "the data row key value here and more tokens"),
      (2L, Map("k" -> "v2"), "the data row key value here and more tokens"))
      .toDF("doc_id", "meta", "text")
    val kept = Corpus.curate(docs, "doc_id", "text", stop)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(kept.select("meta").collect().head.getMap[String, String](0)
      .get("k").contains("v1"))
  }

  test("curate keeps stats columns and drops the text payload") {
    val docs = Seq((1L, "en", "web", "one two three four five six seven"))
      .toDF("doc_id", "lang", "source", "text")
    val out = Corpus.curate(docs, "doc_id", "text", stop)
    assert(out.columns.toSet ==
      Set("doc_id", "lang", "source", "n_tokens", "len_text", "fp"))
    val r = out.select("n_tokens", "len_text").as[(Int, Int)].head()
    assert(r == ((7, 33)))
  }

  test("repetitionStats: repeated text scores high, unique text zero") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"), // 5 bigrams, 1 distinct
      (2L, "every word here appears exactly once total"), // all distinct
      (3L, "one")) // <2 tokens: dropped
      .toDF("doc_id", "text")
    val got = Corpus.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((5L, 1L, 0.8)))
    assert(got(2L)._3 == 0.0)
    assert(!got.contains(3L))
  }

  test("decontaminate flags only verbatim n-gram leakage, via a broadcast join") {
    val benchmark = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")) // 2 distinct 5-grams
      .toDF("doc_id", "text")
    val train = Seq(
      // embeds the benchmark's first 5-gram verbatim → flagged, 1 hit
      (1L, "intro words alpha beta gamma delta epsilon closing remark"),
      // shares only a 4-token run (no 5-gram) → clean
      (2L, "alpha beta gamma delta something else entirely here"),
      // disjoint vocabulary → clean
      (3L, "totally unrelated sentence about spark plans and shuffles"))
      .toDF("doc_id", "text")
    val flagged = Corpus.decontaminate(
      train, benchmark, "doc_id", "text", n = 5)
    assert(flagged.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 1L)))
    // the benchmark shingle side must broadcast: the corpus side of
    // this join is the 100 TB table and must not shuffle to meet it
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingles not broadcast:\n$plan")
    // and nothing may exchange BELOW the broadcast join on the corpus
    // side: the per-doc distinct runs on the matches, after the join
    // static-shape pin with AQE off (AQE hides the join inside query
    // stages): nothing may exchange BELOW the broadcast join on the
    // corpus side — the per-doc distinct runs on matches, post-join
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bhj = Corpus.decontaminate(train, benchmark, "doc_id", "text",
          n = 5)
        .queryExecution.executedPlan.collectFirst {
          case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
        }.get
      val streamSideExchanges = bhj.left.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(streamSideExchanges.isEmpty,
        s"corpus side shuffles before the broadcast filter:\n$bhj")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val kept = Corpus.decontaminatedKeep(
      train, benchmark, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
    // empty benchmark: nothing flagged, everything kept
    val keptAll = Corpus.decontaminatedKeep(
      train, benchmark.filter(lit(false)), "doc_id", "text", n = 5)
    assert(keptAll.count() == 3L)
  }

  test("assignSplit covers every row, near the declared proportions, " +
    "independently of the sampling salt") {
    val df = (0L until 2000L).toDF("id")
    val out = Corpus.assignSplit(df, "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(out.filter(col("split").isNull).count() == 0)
    val bySplit = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(bySplit("train") > 1500 && bySplit("train") < 1700)
    assert(bySplit("val") > 120 && bySplit("val") < 280)
    assert(bySplit("test") > 120 && bySplit("test") < 280)
    // deterministic: identical assignment on re-evaluation
    val again = Corpus.assignSplit(df, "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(out.exceptAll(again).isEmpty)
    // salt isolation: the split bucket is NOT the sampling bucket, so
    // sampled-out documents are not systematically e.g. test-heavy
    val sampleBuckets = df.withColumn("b", Corpus.hashBucket(col("id"), "smpl"))
    assert(out.select("id", "bucket")
      .join(sampleBuckets.withColumnRenamed("b", "sb"), "id")
      .filter(col("bucket") =!= col("sb")).count() > 0)
    // percents must sum to 100
    intercept[IllegalArgumentException] {
      Corpus.assignSplit(df, "id", Seq("train" -> 80, "val" -> 10))
    }
  }

  test("redactPii scrubs every rule's matches and leaves clean text alone") {
    val df = Seq(
      (1L, "mail me at jane.doe+spam@corp.example.org today"),
      (2L, "call +1-555-0123 or visit 192.168.0.1 now"),
      (3L, "no pii here, just words and numbers 42"),
      (4L, "two mails a@b.io c.d@e.co and ip 10.0.0.7"),
      (5L, "ssn 123-45-6789 and account GB29NWBK60161331926819 ok"),
      (6L, "date-ish 2024-01-0131 and plain code AB12 survive"))
      .toDF("id", "text")
    val out = df.select(col("id"),
      Corpus.redactPii(col("text")).as("clean"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail me at <EMAIL> today")
    assert(out(2L) == "call <PHONE> or visit <IP> now")
    assert(out(3L) == "no pii here, just words and numbers 42")
    assert(out(4L) == "two mails <EMAIL> <EMAIL> and ip <IP>")
    assert(out(5L) == "ssn <SSN> and account <IBAN> ok")
    // 4-digit year-dash groups don't match the 3-2-4 SSN shape, and a
    // bare [A-Z]{2}[0-9]{2} without 10 more alnums is not IBAN-like
    assert(out(6L) == "date-ish 2024-01-0131 and plain code AB12 survive")
    // nothing matching any default rule survives redaction
    for ((pat, _) <- Corpus.defaultPiiRules)
      assert(df.select(Corpus.redactPii(col("text")).as("c"))
        .filter(regexp_count(col("c"), lit(pat)) > 0).count() == 0)
  }

  test("domainMixture weights normalize to 1 and order by sqrt(tokens)") {
    val df = Seq.tabulate(400)(i => (s"d${i % 4}", "x " * (i % 4 + 1)))
      .toDF("source", "text")
    val out = Corpus.domainMixture(df, "source",
      size(graft.ops.TextDedup.tokens(col("text"))))
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq("d0", "d1", "d2", "d3"))
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-5)
    // monotone in token mass, but flatter than raw proportions
    val weights = out.map(_._4)
    assert(weights.sorted.toSeq == weights.toSeq)
    val tokens = out.map(_._3.toDouble)
    assert(weights.last / weights.head <
      tokens.last / tokens.head) // sqrt damps the dominant domain
  }

  test("unigramLogProb scores rare-token docs above common-token docs") {
    // 'common' appears 10x, 'rare' once: total 12 tokens
    val df = (Seq.tabulate(10)(i => (i.toLong, "common")) :+
      (10L, "rare common")).toDF("id", "text")
    val h = new graft.ops.CacheHandle
    val out = Corpus.unigramLogProb(df, "id", "text", h)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    h.release()
    val pCommon = 11.0 / 12.0
    val pRare = 1.0 / 12.0
    assert(math.abs(out(0L) - (-math.log(pCommon))) < 1e-5)
    assert(math.abs(out(10L) -
      (-(math.log(pRare) + math.log(pCommon)) / 2.0)) < 1e-5)
    assert(out(10L) > out(0L))
  }

  test("unigramLogProbAgainst scores a batch on an external vocabulary, " +
    "counting OOV, identically from memory or the bucketed table") {
    val corpus = Seq((1L, "common common common rare")).toDF("id", "text")
    val batch = Seq(
      (10L, "common rare"),          // both known
      (11L, "common unseen"),        // one OOV
      (12L, "unseen alien tokens"))  // all OOV → dropped
      .toDF("id", "text")
    val vocab = corpus
      .select(explode(graft.ops.TextDedup.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val mem = Corpus.unigramLogProbAgainst(batch, "id", "text", vocab)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // total=4: P(common)=3/4, P(rare)=1/4
    assert(mem.map(_._1) == Seq(10L, 11L))
    val r10 = mem.head
    assert(r10._2 == 2 && r10._3 == 0)
    assert(math.abs(r10._4 -
      -((math.log(0.75) + math.log(0.25)) / 2.0)) < 1e-5)
    val r11 = mem(1)
    assert(r11._2 == 2 && r11._3 == 1)
    assert(math.abs(r11._4 - -math.log(0.75)) < 1e-5)
    // the persisted-vocabulary path returns the identical scores
    Corpus.writeVocabulary(corpus, "text", "vocab_b", buckets = 4)
    try {
      val disk = Corpus.unigramLogProbAgainst(
        batch, "id", "text", spark.table("vocab_b"))
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(disk == mem)
    } finally spark.sql("DROP TABLE IF EXISTS vocab_b")
  }

  test("bigramLogProb scores unusual word order above common order") {
    // 'a b' appears 3x, 'a c' once: P(b|a)=3/4, P(c|a)=1/4
    val df = Seq((0L, "a b"), (1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("id", "text")
    val h = new graft.ops.CacheHandle
    val out = Corpus.bigramLogProb(df, "id", "text", h)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    h.release()
    assert(math.abs(out(0L) - (-math.log(3.0 / 4.0))) < 1e-5)
    assert(math.abs(out(3L) - (-math.log(1.0 / 4.0))) < 1e-5)
    assert(out(3L) > out(0L)) // the rare continuation scores higher
    // single-token docs produce no bigram and drop
    assert(!Corpus.bigramLogProb(
      Seq((9L, "solo")).toDF("id", "text"), "id", "text")
      .collect().exists(_ => true))
  }

  test("chunkTokens: overlap windows, short docs, no degenerate tail") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than size
      (3L, (1 to 8).map(i => s"u$i").mkString(" ")))  // exactly size
      .toDF("id", "text")
    val out = Corpus.chunkTokens(df, "id", "text", size = 8, overlap = 4)
      .orderBy("id", "chunk_idx")
      .as[(Long, Long, String, Int)].collect()
    val byDoc = out.groupBy(_._1)
    // 10 tokens, size 8, step 4: starts 1 and 5 → [1..8], [5..10]
    assert(byDoc(1L).map(c => (c._2, c._4)).toSeq == Seq((0L, 8), (1L, 6)))
    assert(byDoc(1L)(0)._3.startsWith("t1 ") &&
      byDoc(1L)(1)._3 == "t5 t6 t7 t8 t9 t10")
    // overlap: last 4 of chunk 0 == first 4 of chunk 1
    assert(byDoc(1L)(0)._3.split(" ").takeRight(4).toSeq ==
      byDoc(1L)(1)._3.split(" ").take(4).toSeq)
    // short doc: exactly one (short) chunk, never zero
    assert(byDoc(2L).map(c => (c._2, c._3)).toSeq == Seq((0L, "a b c")))
    // exact-size doc: one chunk, no empty/contained tail
    assert(byDoc(3L).map(_._4).toSeq == Seq(8))
    // every token of every doc appears in at least one of its chunks
    assert(byDoc(1L).flatMap(_._3.split(" ")).toSet ==
      (1 to 10).map(i => s"t$i").toSet)
    intercept[IllegalArgumentException] {
      Corpus.chunkTokens(df, "id", "text", size = 4, overlap = 4)
    }
  }

  test("repeatPlan: integer weights exact, fractional deterministic") {
    val df = (1L to 100L).map(i =>
      (i, if (i <= 40) "x3" else if (i <= 80) "x1.5" else "x0"))
      .toDF("id", "src")
    val plan = Corpus.repeatPlan(df, "id", "src",
      weightsX100 = Map("x3" -> 300, "x1.5" -> 150, "x0" -> 0),
      defaultX100 = 100)
    val byId = plan.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // whole-number weights repeat every doc exactly weight/100 times
    (1L to 40L).foreach(i => assert(byId(i) == 3))
    // fractional weights give floor or floor+1 copies per doc
    (41L to 80L).foreach(i => assert(byId(i) == 1 || byId(i) == 2))
    // zero weight drops the doc entirely
    (81L to 100L).foreach(i => assert(!byId.contains(i)))
    // copy indices are 1..n dense per doc
    val copies = plan.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).sorted.toSeq)
    copies.foreach { case (_, cs) => assert(cs == (1L to cs.length)) }
    // deterministic: a second run builds the identical plan
    val again = Corpus.repeatPlan(df, "id", "src",
      weightsX100 = Map("x3" -> 300, "x1.5" -> 150, "x0" -> 0),
      defaultX100 = 100)
    assert(plan.orderBy("id", "copy_idx").collect().toSeq ==
      again.orderBy("id", "copy_idx").collect().toSeq)
  }

  test("packSequences: concat-and-chop spans cover every token exactly once") {
    val df = Seq(
      (1L, 100L), // spans seq 0 and 1 (window 64)
      (2L, 50L),  // spans seq 1 and 2
      (3L, 0L),   // zero tokens: contributes nothing
      (4L, 14L))  // tail of seq 2
      .toDF("doc_id", "n_tokens")
    val out = Corpus.packSequences(df, "doc_id", "n_tokens", window = 64)
      .orderBy("seq_id", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // (seq_id, doc_id, doc_tok_start, tok_len, seq_off)
    assert(out == Seq(
      (0L, 1L, 0L, 64L, 0L),
      (1L, 1L, 64L, 36L, 0L),
      (1L, 2L, 0L, 28L, 36L),
      (2L, 2L, 28L, 22L, 0L),
      (2L, 4L, 0L, 14L, 22L)))
    // every full sequence holds exactly `window` tokens; spans tile
    // each doc's token range without gap or overlap
    val bySeq = out.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    assert(bySeq(0L) == 64L && bySeq(1L) == 64L && bySeq(2L) == 36L)
    val byDoc = out.groupBy(_._2)
    assert(byDoc(1L).sortBy(_._3).map(s => (s._3, s._3 + s._4)).toSeq ==
      Seq((0L, 64L), (64L, 100L)))
    intercept[IllegalArgumentException] {
      Corpus.packSequences(df, "doc_id", "n_tokens", window = 0)
    }
  }

  test("tokenDrift: smoothing, OOV handling, zero drift on identical slices") {
    import spark.implicits._
    val ref = Seq("a a b", "b c").toDF("text")
    val nw = Seq("a d d").toDF("text")
    val out = Corpus.tokenDrift(ref, nw).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    // union vocab {a,b,c,d}: V=4, t_ref=5, t_new=3
    assert(out.keySet == Set("a", "b", "c", "d"))
    assert(out("a")._1 == 2 && out("a")._2 == 1)
    assert(out("d")._1 == 0 && out("d")._2 == 2) // OOV in ref: smoothed, finite
    def contrib(cr: Long, cn: Long): Double = {
      val p = (cn + 1.0) / (3 + 4); val q = (cr + 1.0) / (5 + 4)
      BigDecimal(p * math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("d")._3 == contrib(0, 2)) // over-represented: positive
    assert(out("d")._3 > 0 && out("c")._3 < 0)
    assert(out("b")._3 == contrib(2, 0))
    // identical slices: every contribution is exactly zero
    val same = Corpus.tokenDrift(ref, ref).collect()
    assert(same.forall(_.getDouble(5) == 0.0))
  }

  test("tokenDrift on the real table: KL total non-negative (Gibbs)") {
    val d = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val drift = Corpus.tokenDrift(
      d.filter(org.apache.spark.sql.functions.col("lang") === "en"),
      d.filter(org.apache.spark.sql.functions.col("lang") =!= "en"))
      .collect()
    assert(drift.nonEmpty)
    // sum of per-token contributions = smoothed KL(new‖ref) ≥ 0; the
    // outputs are rounded to 6 dp, so allow that much slack per token
    val total = drift.map(_.getDouble(5)).sum
    assert(total >= -drift.length * 5e-7, s"KL total negative: $total")
  }

  test("hashingTf: counts sum to token count, buckets bounded, collisions add") {
    import spark.implicits._
    val df = Seq((1L, "a b a c"), (2L, "b b")).toDF("id", "text")
    val tf = Corpus.hashingTf(df, "id", "text", numFeatures = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tf.keys.forall { case (_, b) => b >= 0 && b < 16 })
    assert(tf.filter(_._1._1 == 1L).values.sum == 4) // every token counted
    assert(tf.filter(_._1._1 == 2L).values.sum == 2)
    // forcing every token into ONE bucket: collisions accumulate
    val one = Corpus.hashingTf(df, "id", "text", numFeatures = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(one == Map(1L -> 4L, 2L -> 2L))
  }

  test("compressionRatio: exact deflate lengths; repetitive << random") {
    import spark.implicits._
    val rep = "the row the row the row the row the row " * 20
    val rnd = new scala.util.Random(42)
    val noise = (1 to 800).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString("")
    val df = Seq((1L, rep), (2L, noise), (3L, "")).toDF("doc_id", "text")
    val out = Corpus.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // independent reference: the same zlib level via java.util.zip
    def refDeflate(s: String): Long = {
      val d = new java.util.zip.Deflater(6)
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](64 * 1024)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      n
    }
    assert(out(1L)._1 == rep.length && out(1L)._2 == refDeflate(rep))
    assert(out(2L)._2 == refDeflate(noise))
    // the heuristic's whole point: templated text compresses far
    // below high-entropy text
    assert(out(1L)._3 < 0.1 && out(2L)._3 > 0.5)
    assert(out(3L)._3 == 1.0) // empty text: defined, not a div-by-zero
  }

  test("kAnonymityReport flags exactly the under-k quasi-id groups") {
    import spark.implicits._
    val df = (Seq.fill(5)(("en", "web")) ++ Seq.fill(2)(("en", "pdf")) ++
      Seq(("de", "web"))).toDF("lang", "source")
    val rep = Corpus.kAnonymityReport(df, Seq("lang", "source"), k = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(rep == Map(
      ("en", "web") -> ((5L, false)),
      ("en", "pdf") -> ((2L, true)),
      ("de", "web") -> ((1L, true))))
    intercept[IllegalArgumentException] {
      Corpus.kAnonymityReport(df, Seq.empty, k = 3)
    }
  }

  test("upsertLatest keeps exactly the highest revision per id") {
    import spark.implicits._
    val revs = Seq(
      (1L, "one-v1", 1L), (1L, "one-v3", 3L), (1L, "one-v2", 2L),
      (2L, "two-v1", 1L),
      (3L, "three-v2", 2L), (3L, "three-v1", 1L))
      .toDF("id", "text", "version")
    val out = Corpus.upsertLatest(revs, "id", "version")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      1L -> ("one-v3", 3L), 2L -> ("two-v1", 1L), 3L -> ("three-v2", 2L)))
    // helper column must not leak into the output
    assert(!Corpus.upsertLatest(revs, "id", "version")
      .columns.contains("__rev_rn"))
  }

  test("scd2History collapses runs and closes intervals at the next change") {
    import spark.implicits._
    val revs = Seq(
      (1L, "A", 1L), (1L, "A", 2L), (1L, "B", 3L), (1L, "B", 4L),
      (1L, "A", 5L), (2L, "X", 1L)
    ).toDF("id", "attr", "v")
    val h = Corpus.scd2History(revs, "id", "attr", Seq("v"))
      .orderBy("id", "v")
      .select("id", "attr", "v", "valid_to", "is_current")
      .collect()
    assert(h.length == 4)
    // id 1: A@[1,3), B@[3,5), A@[5,∞); id 2: X@[1,∞)
    assert(h(0).getString(1) == "A" && h(0).getLong(2) == 1L &&
      h(0).getLong(3) == 3L && !h(0).getBoolean(4))
    assert(h(1).getString(1) == "B" && h(1).getLong(2) == 3L &&
      h(1).getLong(3) == 5L && !h(1).getBoolean(4))
    assert(h(2).getString(1) == "A" && h(2).getLong(2) == 5L &&
      h(2).isNullAt(3) && h(2).getBoolean(4))
    assert(h(3).getString(1) == "X" && h(3).getBoolean(4))
  }

  test("scd2History change detection is null-safe") {
    import spark.implicits._
    val revs = Seq[(Long, Option[String], Long)](
      (1L, None, 1L), (1L, Some("A"), 2L), (1L, None, 3L), (1L, None, 4L)
    ).toDF("id", "attr", "v")
    val h = Corpus.scd2History(revs, "id", "attr", Seq("v"))
      .orderBy("v").select("attr", "v").collect()
    // a leading null equals the implicit pre-history null (no version);
    // A opens at 2; A→null opens at 3; the null run collapses
    assert(h.map(r => (Option(r.getString(0)), r.getLong(1))).toSeq ==
      Seq((Some("A"), 2L), (None, 3L)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val oldSnap = Seq((1L, "fa"), (2L, "fb"), (3L, "fc")).toDF("id", "fp")
    val newSnap = Seq((2L, "fb"), (3L, "fc2"), (4L, "fd")).toDF("id", "fp")
    val st = Corpus.snapshotDiff(oldSnap, newSnap, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("lDiversityReport flags homogeneous groups however large") {
    import spark.implicits._
    val rows = Seq(
      // group (a): 3 rows, all the same sensitive value -> flagged
      ("a", 1L), ("a", 1L), ("a", 1L),
      // group (b): 2 rows, 2 distinct values -> passes at l=2
      ("b", 1L), ("b", 2L)
    ).toDF("q", "sens")
    val rep = Corpus.lDiversityReport(rows, Seq("q"), "sens", l = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rep("a") == ((3L, 1L, true)))
    assert(rep("b") == ((2L, 2L, false)))
    intercept[IllegalArgumentException](
      Corpus.lDiversityReport(rows, Nil, "sens", 2))
  }

  test("pmiPairs matches a hand computation") {
    import spark.implicits._
    // docs {a b}, {b a}, {a c}, {b}: n=4, c_a=3, c_b=3, c_c=1,
    // c_ab=2, c_ac=1 → pmi(a,b)=ln(8/9), pmi(a,c)=ln(4/3)
    val docs = Seq((1L, "a b"), (2L, "b a"), (3L, "a c"), (4L, "b"))
      .toDF("doc_id", "text")
    val got = Corpus.pmiPairs(docs, "doc_id", "text")
      .orderBy("tok_a", "tok_b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c")))
    assert(got(("a", "b"))._1 == 2L && got(("a", "c"))._1 == 1L)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(math.abs(got(("a", "b"))._2 - r6(math.log(8.0 / 9))) < 1e-9)
    assert(math.abs(got(("a", "c"))._2 - r6(math.log(4.0 / 3))) < 1e-9)
  }

  test("compressionRatio golden values on the fixed sf0.01 corpus") {
    // q_compress_ratio is rows-only at the gate (no SQL engine
    // exposes deflate), so regression protection lives HERE: exact
    // (raw_len, deflate_len, ratio) for five fixed documents,
    // computed once with java.util.zip.Deflater(6) on this corpus.
    // A drift in tokenizing, UTF-8 handling, level, or strategy
    // breaks these constants.
    val docs = Tables.table(spark, "/root/testdata/sf0.01", "documents")
      .filter(col("doc_id") < 5)
    val got = Corpus.compressionRatio(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val expected = Map(
      0L -> ((157L, 99L, 0.630573)),
      1L -> ((406L, 181L, 0.445813)),
      2L -> ((246L, 133L, 0.54065)),
      3L -> ((147L, 99L, 0.673469)),
      4L -> ((250L, 139L, 0.556)))
    assert(got == expected)
  }

  test("pmiPairs maxDocVocab bounds the per-doc pair explosion") {
    import spark.implicits._
    // one pathological doc with 60 distinct tokens (a dictionary dump)
    // plus a normal 2-token doc: uncapped, the hot doc alone emits
    // C(60,2) = 1770 pairs; capped at 5 it contributes at most C(5,2).
    val dump = (1 to 60).map(i => f"tok$i%02d").mkString(" ")
    val docs = Seq((1L, dump), (2L, "aaa bbb")).toDF("doc_id", "text")
    val uncapped = Corpus.pmiPairs(docs, "doc_id", "text")
    assert(uncapped.count() == 60L * 59 / 2 + 1)
    val capped = Corpus.pmiPairs(docs, "doc_id", "text", maxDocVocab = 5)
    assert(capped.count() <= 5L * 4 / 2 + 1)
    // deterministic: the md5-order trim picks the same tokens every run
    val again = Corpus.pmiPairs(docs, "doc_id", "text", maxDocVocab = 5)
    assert(capped.exceptAll(again).isEmpty && again.exceptAll(capped).isEmpty)
  }

  test("spanCorruptionPlan: one in-bounds span per full block, stable") {
    import spark.implicits._
    // 45 tokens → 2 full blocks; 19 tokens → none; 20 → exactly one
    val docs = Seq(
      (1L, (1 to 45).map("t" + _).mkString(" ")),
      (2L, (1 to 19).map("t" + _).mkString(" ")),
      (3L, (1 to 20).map("t" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val plan = Corpus.spanCorruptionPlan(docs, "doc_id", "text")
      .orderBy("doc_id", "span_idx").collect()
    val byDoc = plan.groupBy(_.getLong(0))
    assert(byDoc(1L).length == 2 && !byDoc.contains(2L) &&
      byDoc(3L).length == 1)
    plan.foreach { r =>
      val (b, start, len) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(len == 3L)
      // the span sits wholly inside its own block → non-overlapping
      assert(start >= b * 20 && start + len <= (b + 1) * 20)
    }
    // masked density over covered blocks is exactly spanLen/block
    assert(plan.map(_.getLong(3)).sum == 3L * 3)
    // RNG-free: a second run replays the identical plan
    val again = Corpus.spanCorruptionPlan(docs, "doc_id", "text")
      .orderBy("doc_id", "span_idx").collect()
    assert(plan.toSeq == again.toSeq)
  }
}
