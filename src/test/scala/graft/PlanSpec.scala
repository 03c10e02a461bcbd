package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that decide whether these
  * operators survive a 100× scale-up, pinned as tests so a regression
  * (lost pushdown, broadcast falling back to shuffle, global sort
  * sneaking in) fails CI rather than a cluster bill.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q_repeated_spans: pure keyed aggregate — no join of any kind") {
    // the memorization audit must stay counts-only: a hot span costs a
    // bigger count, never a posting self-join's quadratic fan-out
    val p = plan("q_repeated_spans")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
  }

  test("q_ngram_novelty: span-stats join is keyed, no cartesian") {
    val p = plan("q_ngram_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"non-keyed join in:\n$p")
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_pq_adc: code lookup joins broadcast; no cartesian") {
    // the ADC serving path must never touch raw database vectors:
    // codes join a broadcast 8x16 lookup table
    val p = plan("q_pq_adc")
    assert(p.contains("BroadcastHashJoin"), s"lookup not broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q_serial_date: key predicate is pushed to the parquet scan") {
    val p = plan("q_serial_date")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), LessThanOrEqual(o_orderkey,2000)]"),
      s"missing pushdown in:\n$p")
  }

  test("q_visible: scan reads only the projected columns") {
    val p = plan("q_visible")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("props"), s"props not pruned: $read")
    assert(!read.contains("value>") || read.contains("value"), read)
  }

  test("q_join_revenue: all three dimension joins broadcast") {
    val p = plan("q_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3,
      s"expected 3 broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("q_agg_pricing: map-side partial aggregation present") {
    val p = plan("q_agg_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate in:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate,"),
      s"shipdate filter not pushed:\n$p")
  }

  test("q_topk: TakeOrderedAndProject, not a global sort of the table") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k plan:\n$p")
  }

  test("q_sessionize: single shuffle on user_id feeds window and agg") {
    val p = plan("q_sessionize")
    // window partitioned by user_id; the groupBy(user_id) must reuse
    // that partitioning rather than adding a second exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
  }

  test("q_ann_topk: query side broadcast, candidate scan stays parallel") {
    val p = plan("q_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
  }

  test("no headline query plans a cartesian product") {
    // the intentional cross-products (pair scoring) are all bounded AND
    // broadcast; an unbounded CartesianProduct is always a bug
    graft.tools.ExplainDump.headline.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$p")
    }
  }

  test("q_dedup_simhash: banded pairing, no nested-loop all-pairs join") {
    val p = plan("q_dedup_simhash")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"simhash pairing fell back to an all-pairs nested loop:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"simhash pairing plans a cartesian:\n$p")
  }

  test("q_prefix_jaccard: equi-join candidates off cached prefix, no all-pairs") {
    try {
      val p = plan("q_prefix_jaccard")
      assert(!p.contains("CartesianProduct"),
        s"prefix pairing plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"prefix pairing fell back to an all-pairs nested loop:\n$p")
      // the pipeline persists sh/sz/rank/pref; losing ANY of those
      // re-runs a corpus pass per consumer (the pref self-join alone
      // has two). Count the cache reads, don't just probe presence —
      // dropping the pref persist would still leave sh cached and a
      // contains() check green.
      val scans = "InMemoryTableScan".r.findAllIn(p).size
      assert(scans >= 4,
        s"expected >= 4 cache reads (pref x2 sides, sh verify x2), " +
          s"got $scans — a shared subplan lost its persist:\n$p")
    } finally {
      // plan() ran prefixJaccardPairs' eager counts — real
      // materialized caches on the shared session; leaking them lets
      // the CacheManager rewrite later tests' canonically-equal
      // subtrees to InMemoryTableScan and flip their plan assertions
      graft.ops.QueryCaches.releaseAll()
      spark.catalog.clearCache()
    }
  }

  test("q_prefix_jaccard_capped: left-anti cap off the persisted prefix " +
      "frame, equi-join candidates, no all-pairs") {
    try {
      val p = plan("q_prefix_jaccard_capped")
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs nested loop in:\n$p")
      // the cap is a LEFT ANTI join of the prefix frame against the
      // over-cap audit set — dropping it would silently revert the
      // twin to the (audit-tripping) lossless join
      assert(p.contains("LeftAnti"), s"cap anti-join missing in:\n$p")
      // sh / pref / over / capped are persisted and multiply read
      val scans = "InMemoryTableScan".r.findAllIn(p).size
      assert(scans >= 4,
        s"expected >= 4 cache reads, got $scans — a shared subplan " +
          s"lost its persist:\n$p")
    } finally {
      graft.ops.QueryCaches.releaseAll()
      spark.catalog.clearCache()
    }
  }

  test("q_prefix_jaccard_incr: cross-side candidates are keyed " +
      "equi-joins, no all-pairs") {
    try {
      val p = plan("q_prefix_jaccard_incr")
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs nested loop in:\n$p")
      // union shingles / sizes / prefix are persisted, multiply read
      val scans = "InMemoryTableScan".r.findAllIn(p).size
      assert(scans >= 4,
        s"expected >= 4 cache reads, got $scans:\n$p")
    } finally {
      graft.ops.QueryCaches.releaseAll()
      spark.catalog.clearCache()
    }
  }

  test("q_prefix_jaccard_incr_idx: corpus sides are bucketed scans " +
      "(the zero-exchange layout), no all-pairs") {
    try {
      val p = plan("q_prefix_jaccard_incr_idx")
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs nested loop in:\n$p")
      // the candidate and verify joins read the _pref/_sh bucketed
      // tables directly (the _rank scan sits inside the cached batch
      // prefix frame; the per-join zero-exchange pin with broadcast
      // and AQE disabled lives in TextDedupSpec)
      val bucketed = "Bucketed: true".r.findAllIn(p).size
      assert(bucketed >= 2,
        s"expected >= 2 bucketed corpus scans, got $bucketed in:\n$p")
      assert("graft_ppjidx".r.findAllIn(p).size >= 2,
        s"index tables not read in:\n$p")
    } finally {
      graft.ops.QueryCaches.releaseAll()
      spark.catalog.clearCache()
    }
  }

  test("q_cosine_allpairs: equi-join candidates off cached prefix, " +
      "no all-pairs") {
    try {
      val p = plan("q_cosine_allpairs")
      assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs nested loop in:\n$p")
      // tf / norms / prefix are persisted and multiply read (prefix
      // feeds both candidate sides, tf both verify sides)
      val scans = "InMemoryTableScan".r.findAllIn(p).size
      assert(scans >= 4,
        s"expected >= 4 cache reads, got $scans:\n$p")
    } finally {
      graft.ops.QueryCaches.releaseAll()
      spark.catalog.clearCache()
    }
  }

  test("scaled batching/reshape twins have no single-partition exchange") {
    Seq("q_batch_scaled", "q_reshape_scaled").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Exchange SinglePartition"),
        s"$name still funnels through one partition:\n$p")
    }
  }

  test("q_topk_agg: map-side partial heap aggregation (no per-query sort)") {
    val p = plan("q_topk_agg")
    // TypedImperativeAggregate plans as ObjectHashAggregate; partial +
    // final means only k-element buffers cross the shuffle
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate in:\n$p")
    // plan nodes print without the Exec suffix ("Window [...]"): the
    // heap aggregate must leave no window operator in the plan at all
    assert(!"\\bWindow\\b".r.findFirstIn(p).isDefined,
      s"top-k fell back to a window sort:\n$p")
  }

  test("q_tfidf: AQE broadcasts the measured-small vocab; no forced hint") {
    // the vocabulary join deliberately carries NO broadcast() hint (a
    // corpus vocab is unbounded at 100 TB and a forced hint is honored
    // unconditionally). The pin is therefore on the FINAL adaptive
    // plan after execution: at gate scale AQE must have measured the
    // vocab small and converted the join to a broadcast itself.
    val d = SparkEntry.queries("q_tfidf")(spark, dir)
    d.collect()
    val p = d.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
  }

  test("q_dedup_lines: span window + reassembly = two hash exchanges") {
    val p = plan("q_dedup_lines")
    // exchange 1: keep-first window on the span fingerprint;
    // exchange 2: per-document reassembly aggregate. Anything more
    // means the segment explode started shuffling raw text around.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q_embed_centroid: one keyed exchange, map-side partial means") {
    val p = plan("q_embed_centroid")
    // posexplode → partial avg/count → ONE (group, pos) exchange →
    // final agg; more exchanges would mean the explode output (corpus
    // × dim rows) is shuffled raw
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate in:\n$p")
  }

  test("q_corpus_drift: vocab join keyed full-outer, totals broadcast") {
    val p = plan("q_corpus_drift")
    // the union-vocab join must stay a keyed shuffle (FullOuter on
    // tok) — never a forced broadcast (vocab is corpus-sized); the
    // only nested-loop allowed is the 1-row totals cross join
    assert(p.contains("FullOuter"), s"vocab join not full-outer:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"1-row totals not broadcast:\n$p")
  }

  test("q_orc_roundtrip: lang predicate is pushed to the ORC scan") {
    val p = plan("q_orc_roundtrip")
    assert(p.toLowerCase.contains("orc"), s"not an ORC scan:\n$p")
    assert(p.contains("EqualTo(lang,en)") || p.contains("lang = en"),
      s"lang filter not pushed to the ORC scan:\n$p")
  }

  test("q_sample_exact: local prune then stratum window — two exchanges") {
    // two-phase (r13): a (stratum, input-partition) local top-n
    // bounds the final stratum window to ≤ n·partitions survivors —
    // a FIXED-DOMAIN stratum otherwise sorts corpus/|strata| rows per
    // reducer. Exchange 1: the local window's (stratum, pid) key;
    // exchange 2: the final stratum window over the pruned survivors.
    val p = plan("q_sample_exact")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges in:\n$p")
  }

  test("q_ivf_stats: centroid assignment broadcasts, no cartesian") {
    val p = plan("q_ivf_stats")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroid set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("persisted IVF: a cell probe prunes to that cell's directory") {
    // materialize the gate query once so the saved index exists
    SparkEntry.queries("q_ann_ivf_persisted")(spark, dir).collect()
    graft.ops.QueryCaches.releaseAll()
    val path = Tables.scratchDir(spark, "graft_ivf_persisted").toString
    val m = graft.ops.IvfIndex.load(spark, path)
    val probe = m.assigned
      .filter(org.apache.spark.sql.functions.col("cell") === 3)
    val p = probe.queryExecution.executedPlan.toString
    // the cell predicate must land in PartitionFilters (directory
    // pruning — only cell=3 files are read), not a post-scan Filter
    val pf = p.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell"), s"cell probe not a partition filter:\n$p")
    assert(probe.count() > 0, "probed cell unexpectedly empty")
  }

  test("q_sample_hash: pure scan+filter, no exchange before the oracle sort") {
    val p = plan("q_sample_hash")
    // the sample itself is shuffle-free; the only exchange allowed is
    // the ORDER BY's range partitioning for oracle determinism
    assert(!p.contains("Exchange hashpartitioning"),
      s"hash sampling plans a hash exchange:\n$p")
  }

  test("q_dedup_incremental: anti-join on the fingerprint, no cartesian") {
    val p = plan("q_dedup_incremental")
    assert(p.contains("LeftAnti"), s"no anti-join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q_curate: quality filter runs before the dedup window exchange") {
    val p = plan("q_curate")
    // exactly one hash exchange (the fp window); gates are scan-side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$p")
  }

  test("q_funnel: stage joins stay keyed (no nested loop, no cartesian)") {
    val p = plan("q_funnel")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the three final single-row counts cross-join via broadcast —
    // the per-user stage joins themselves must be hash joins
    assert("HashJoin".r.findAllIn(p).nonEmpty, s"no hash join in:\n$p")
  }

  test("flagship entry: broadcast star join with decimal aggregation") {
    val e = SparkEntry.entry(spark)
    val p = e.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
    assert(p.contains("HashAggregate"))
    assert(e.count() > 0) // the driver's smoke check
  }

  test("q_bloom_prune: literal bloom probe filters the fact side of the semi join") {
    val p = plan("q_bloom_prune")
    assert(p.contains("LeftSemi"), p)
    // the probe rides the plan as expressions over the 8 KiB word
    // array literal — shiftright is its signature op
    assert(p.contains("shiftright"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_pagerank: result reads from the checkpoint cut, no cartesian") {
    // building the query runs the 6 eager per-round checkpoints; the
    // returned plan must be a scan of the final checkpoint, not a
    // 6-round join tree re-analyzed per action
    val p = plan("q_pagerank")
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("banded/posting pair miners never plan an all-pairs join") {
    Seq("q_media_neardup", "q_containment").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$q:\n$p")
    }
  }

  test("q_scd_asof: the temporal lookup runs on the native as-of node") {
    val p = plan("q_scd_asof")
    assert(p.contains("AsOfJoin"), p) // AsOfJoinExec prints as AsOfJoin
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_hll_distinct: register pipeline partially aggregates, no cartesian") {
    val p = plan("q_hll_distinct")
    // both the per-register max and the final register fold must
    // map-side combine; the 1-row broadcast crossJoins are the only
    // nested-loop shapes allowed
    assert("partial_max|partial".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_rolling_dau: trailing window is equi-join explode, never a range join") {
    // the 7-day window must come from the bounded per-row explode,
    // not a non-equi join (which plans a nested loop over the grid)
    val p = plan("q_rolling_dau")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Generate explode") || p.contains("explode"), p)
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_adamic_adar: capped weighted fold; term computed on the degree table") {
    val p = plan("q_adamic_adar")
    // the PRODUCTION cap machinery — overCapBuckets feeding a
    // left-anti join on the key — must be in the executed plan (the
    // q_jaccard_capped contract); if it were optimized away the gate
    // would prove nothing about the capped plan
    assert(p.contains("LeftAnti"), s"cap anti-join missing in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    // the ln+decimal term must ride the degree aggregate, not the
    // pair rows: it appears under a HashAggregate subtree's project,
    // and only ONE decimal cast of the LN expression exists in the plan
    assert("cast\\(\\(1.0 / LN".r.findAllIn(p).size <= 2, p)
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_resource_alloc: capped weighted fold, term on the degree table") {
    // same contract as q_adamic_adar: the second consumer of the
    // weighted fold must also run the cap machinery
    val p = plan("q_resource_alloc")
    assert(p.contains("LeftAnti"), s"cap anti-join missing in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_jaccard_capped: the cap anti-join is in the executed plan") {
    // the point of the gate is that the PRODUCTION plan shape — the
    // overCapBuckets aggregate feeding a left-anti join on the key —
    // runs and still hash-matches the uncapped oracle; if the cap
    // machinery were optimized away the gate would prove nothing
    val p = plan("q_jaccard_capped")
    assert(p.contains("LeftAnti"), s"cap anti-join missing in:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_semantic_dedup_capped: the sub-shard machinery is in the executed plan") {
    // same contract as q_jaccard_capped: the PRODUCTION cell-cap plan
    // (id-hash sub-sharding of over-cap cells) runs and still
    // hash-matches the exact oracle; if it were optimized away the
    // gate would prove nothing
    val p = plan("q_semantic_dedup_capped")
    assert(p.contains("xxhash64"), s"sub-shard hash missing in:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_ann_ivfpq: cell prune then broadcast ADC lookup, no cartesian scoring") {
    val p = plan("q_ann_ivfpq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_kmeans_exact: Lloyd passes are keyed aggregates with map-side partials") {
    val p = plan("q_kmeans_exact")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
    assert("partial".r.findFirstIn(p).isDefined, p)
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_sql_q6: all three scan predicates pushed; no join, no shuffle beyond the agg") {
    // the 100 TB selective-scan shape: every predicate must reach
    // parquet or the scan reads the whole fact table
    val p = plan("q_sql_q6")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"missing pushdown: $pushed\n$p")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
  }

  test("q_sql_q4: correlated EXISTS decorrelates to a semi join, no nested loop") {
    val p = plan("q_sql_q4")
    assert(p.contains("LeftSemi"), s"EXISTS did not plan as semi join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"non-keyed join in:\n$p")
  }

  test("q_sql_q16: distinct agg expands two-phase; NOT IN stays an anti join") {
    val p = plan("q_sql_q16")
    assert(p.contains("LeftAnti"), s"NOT IN did not plan as anti join:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 3,
      s"distinct agg not two-phase in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q_sql_q13: ON-filtered outer join survives, two aggregate levels, no cartesian") {
    val p = plan("q_sql_q13")
    assert(p.contains("LeftOuter"), s"outer join reduced to inner in:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"stacked aggregates not two-phase in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q_sql_q22: anti join against the filtered fact; threshold via scalar subqueries") {
    val p = plan("q_sql_q22")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not plan as anti join:\n$p")
    assert(p.contains("Subquery") || p.contains("subquery"),
      s"scalar threshold not a subquery plan in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q_sql_q17: correlated scalar avg decorrelates to an aggregate join") {
    val p = plan("q_sql_q17")
    assert("HashAggregate".r.findAllIn(p).size >= 3,
      s"per-part average not a standalone aggregate in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"non-keyed join in:\n$p")
  }

  test("q_sql_q21: EXISTS and NOT EXISTS plan as semi + anti joins") {
    val p = plan("q_sql_q21")
    assert(p.contains("LeftSemi"), s"EXISTS not a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q_sql_q2: correlated scalar min decorrelates to an aggregate join") {
    val p = plan("q_sql_q2")
    // the per-part regional minimum must become a standalone aggregate
    // joined back on ps_partkey — a per-row re-execution would show as
    // a nested-loop or cartesian
    assert("HashAggregate".r.findAllIn(p).size >= 3,
      s"regional min not a standalone aggregate in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"non-keyed join in:\n$p")
  }

  test("q_sql_q8: seven-table star join keeps every edge keyed") {
    val p = plan("q_sql_q8")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"non-keyed join in:\n$p")
    // the two tiny dimension chains (nation×2, region, part filter)
    // must broadcast — a shuffled join against a 25-row table is the
    // wrong plan at any scale
    assert(p.contains("BroadcastHashJoin"), s"no broadcast dims in:\n$p")
  }

  test("q_sql_q12: both date predicates push to the lineitem scan") {
    val p = plan("q_sql_q12")
    // several scans carry PushedFilters — the lineitem one must have
    // the ship-date range
    val pushed = p.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"),
      s"ship-date range not pushed: $pushed\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q_sql_q20: nested IN chain plans as stacked semi joins") {
    val p = plan("q_sql_q20")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"nested IN not stacked semi joins in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"non-keyed join in:\n$p")
  }

  test("q_dedup_substring: gram dup-join keyed, interval merge windows share one doc sort") {
    val p = plan("q_dedup_substring")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"non-keyed join in:\n$p")
    // both window passes (running max + island sum) ride ONE doc-keyed
    // exchange: a second hash exchange on doc_id would mean the merge
    // re-shuffles between its two windows
    val exchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"interval merge re-shuffles between windows ($exchanges doc_id exchanges):\n$p")
    graft.ops.QueryCaches.releaseAll()
  }

  test("q_bucketed_join: neither side shuffles for the join (bucketed layout)") {
    // the recurring-join layout contract, now on the DECLARED query:
    // both sides scan Bucketed and NO side shuffles for the join —
    // the only hash exchange left is the tiny post-join aggregate.
    // (At gate scale AQE may still broadcast the small side — fine;
    // the zero-exchange sort-merge path is pinned by ScaleOpsSpec
    // with broadcast disabled. The layout property here is that the
    // bucketed scans make a shuffle unnecessary at ANY size.)
    val p = plan("q_bucketed_join")
    assert("Bucketed: true".r.findAllIn(p).size >= 2,
      s"expected two bucketed scans in:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"bucketed join re-shuffles a side ($exchanges hash exchanges):\n$p")
  }

  test("unpartitioned-window whitelist is exact: every member still plans one") {
    // the enforcement direction (NO query outside the whitelist plans
    // a global window) rides Verify.runOne on the driver's own run —
    // zero extra cost, every round, full surface. This spec pins the
    // other direction: each whitelisted query still PLANS its bounded
    // global window, so a refactor that removes one must shrink the
    // whitelist rather than leave a stale allowance a future
    // unbounded window could hide behind. sparkPlan (pre-AQE) +
    // persist-boundary recursion per the plan-string rule.
    graft.tools.WindowAudit.whitelist.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val n = graft.tools.WindowAudit.unpartitionedWindows(
        df.queryExecution.sparkPlan)
      assert(n > 0,
        s"$name is whitelisted for a global window but no longer plans " +
          "one — remove it from WindowAudit.whitelist")
      graft.ops.QueryCaches.releaseAll()
    }
  }

  test("q_pmi: vocab count joins unhinted; AQE broadcasts at gate scale") {
    // same contract as q_tfidf: no forced hint on vocabulary-sized
    // builds; pin that AQE converts on measured size in the FINAL plan
    val d = SparkEntry.queries("q_pmi")(spark, dir)
    d.collect()
    val p = d.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
  }
}
