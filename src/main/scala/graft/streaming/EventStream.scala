package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over the `events` stream shape
  * (`event_id, ts, user_id, event_type, value`). The reference has no
  * streaming at all (SURVEY.md §2.10) — every load is a full snapshot —
  * so this is pure engine capability: the same aggregations the batch
  * side declares, expressed incrementally with watermarked state.
  *
  * Scale stance: state is keyed (by window×type or by user), so it
  * shards across executors; watermarks bound state size; no
  * foreachBatch driver funnels.
  */
object EventStream {

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  // public: the state encoder's generated code instantiates it
  final case class OpenSession(start: Long, end: Long, n: Long)
  // every not-yet-watermark-sealed chain for a key (public: codegen
  // instantiates state classes); bounded by the watermark horizon
  final case class OpenChains(chains: Seq[OpenSession])

  /** File-source stream over an events parquet directory: each new
    * file dropped in `dir` becomes a micro-batch. Streams need an
    * explicit schema, but the events `ts` physical type varies by data
    * generation (epoch-ns Long vs µs timestamp — see
    * [[graft.Tables.withEventTime]]), so the schema is taken from a
    * one-off batch footer read of the files already present, then the
    * stream is normalized to (`ts_ns` Long, `ts` TimestampType) so
    * watermarks work identically over either source shape.
    */
  def fromEventsDir(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.Tables.withEventTime(
      spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .parquet(dir))

  /** Tumbling-window counts/sums per event type with late-data bound. */
  def windowedCounts(
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Windowed APPROXIMATE distinct users — linear counting as
    * streaming state: per window the state is the distinct md5-bucket
    * set (≤ m elements however many users arrive — the bounded-state
    * property that makes distinct counting streamable at all; an
    * exact distinct would hold every user id), and the estimate
    * −m·ln((m−filled)/m) is the SAME deterministic formula the batch
    * [[graft.ops.Sketches.linearCount]] gate hash-matches, so the
    * streamed estimate is oracle-exact too. Windows emit on close
    * (append mode + watermark), the lakehouse-ingest metric shape.
    */
  def windowedDistinctEst(
      events: DataFrame,
      keyCol: String,
      m: Int = 256,
      watermarkDelay: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame = {
    require(m > 0, s"m must be positive: $m")
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"),
        graft.ops.Sketches.cmBucket(col(keyCol), 0, m).as("bucket"))
      .groupBy(window(col("ts"), windowLen))
      .agg(collect_set(col("bucket")).as("bs"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        size(col("bs")).cast("long").as("n_buckets"))
      .withColumn("est_distinct",
        when(col("n_buckets") < m,
          round(-lit(m.toDouble) *
            log((lit(m.toLong) - col("n_buckets")).cast("double") /
              lit(m.toDouble)), 6))
          .otherwise(lit(m.toDouble)))
  }

  /** Built-in session windows (preferred when per-session output is
    * just aggregates): `session_window` merges gap-contiguous events
    * natively, works identically in batch and streaming, and needs no
    * custom state. [[sessionize]] below remains for custom per-session
    * semantics the built-in can't express.
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: Option[String] = Some("30 minutes")): DataFrame = {
    val base = watermarkDelay.fold(events)(events.withWatermark("ts", _))
    base
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  /** Streaming exact dedup — the batch `TextDedup.exact` semantics
    * expressed incrementally: rows keyed by the normalized-text md5
    * fingerprint, first arrival kept, later duplicates dropped.
    * `dropDuplicatesWithinWatermark` holds per-key state only until
    * the watermark passes the key's event time, so state is bounded by
    * the lateness horizon — a plain `dropDuplicates` on a stream grows
    * state forever, which is the classic 100 TB/forever-running
    * pipeline leak. Input needs (`textCol`, `tsCol` event-time).
    */
  def dedupExact(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp",
        md5(lower(trim(regexp_replace(col(textCol), "\\s+", " ")))))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming segment-level dedup — [[dedupExact]] at span
    * granularity, the streaming half of
    * [[graft.ops.TextDedup.dedupSegments]]: each arriving document
    * explodes (statelessly) into fixed `segTokens`-token spans and the
    * first arrival of every distinct span fingerprint within the
    * watermark horizon survives. State is one entry per distinct
    * in-horizon span fp (watermark-bounded, evicted as time advances)
    * — the live boilerplate filter in an ingest stream. Emits
    * (idCol, tsCol, seg_idx, seg, seg_fp) for kept spans.
    */
  def dedupSegments(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: String = "ts",
      segTokens: Int = 8,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    // segTokens=0 would be an ANSI DIVIDE_BY_ZERO raised per row once
    // the stream starts — fail at the API edge instead
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    docs
      .select(col(idCol), col(tsCol),
        graft.ops.TextDedup.tokens(col(textCol)).as("__toks"))
      .withColumn("__n",
        ((size(col("__toks")) + lit(segTokens - 1)) / lit(segTokens))
          .cast("int"))
      .withColumn("__i", explode(sequence(lit(0), col("__n") - 1)))
      .select(col(idCol), col(tsCol),
        col("__i").cast("long").as("seg_idx"),
        array_join(slice(col("__toks"),
          col("__i") * lit(segTokens) + lit(1), lit(segTokens)), " ")
          .as("seg"))
      .withColumn("seg_fp", md5(col("seg")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("seg_fp")
  }

  /** Streaming content-defined-chunk dedup — [[dedupExact]] at CDC
    * granularity, completing the gear-chunk family's triad (batch
    * q_cdc_chunks, nightly-incremental q_cdc_chunks_incr): each
    * arriving document explodes STATELESSLY into gear chunks and
    * chunk fingerprints via the ONE shared definition
    * ([[graft.ops.TextDedup.cdcChunkFp]] — the same frame the batch
    * and nightly legs build on, so the gear-walk oracle cannot drift
    * from only one of them), and
    * the first arrival of every distinct chunk fingerprint within the
    * watermark horizon survives — the live chunk-store admission
    * filter: a re-scraped document pays state/storage only for chunks
    * the horizon hasn't seen. State is one entry per distinct
    * in-horizon chunk fp (watermark-bounded, evicted as time
    * advances). Emits (idCol, tsCol, off, len, fp) for kept chunks.
    * Null text yields null bytes → null chunk array → explode drops
    * the row (no executor lambda to poison — the wedged-checkpoint
    * class cannot occur).
    */
  def dedupCdcChunks(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      tsCol: String = "ts",
      maskBits: Int = 5,
      minLen: Int = 8,
      maxLen: Int = 64,
      watermarkDelay: String = "10 minutes"): DataFrame =
    graft.ops.TextDedup.cdcChunkFp(docs, Seq(idCol, tsCol), textCol,
        maskBits = maskBits, minLen = minLen, maxLen = maxLen)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-static enrichment + windowed counts per dimension value:
    * the canonical "join the stream to a dimension table" shape. The
    * static side is stateless and RE-EXECUTED every micro-batch, but
    * its FILE SNAPSHOT is pinned when the stream starts: overwriting
    * the dimension's files mid-stream fails the next batch with
    * FILE_NOT_EXIST (measured on plain parquet, catalog table or
    * path, refreshTable notwithstanding). Refreshing a dimension
    * therefore means restarting the stream, or serving the dimension
    * from a snapshot-isolating table format that retains old files.
    * The explicit `broadcast()` hint is
    * valid HERE because a modeled dimension is bounded by design
    * (nation = 25 rows forever); corpus-DERIVED aggregates never
    * carry it (see CLAUDE.md: broadcast-hint rule).
    *
    * The watermark is declared on the stream BEFORE the join so event
    *-time tracking is independent of join selectivity; rows without a
    * dimension match drop out of the inner join but still advanced the
    * watermark — which is also how the gate's sentinel rows flush real
    * windows without polluting the output.
    */
  def enrichedWindowedCounts(
      events: DataFrame,
      dim: DataFrame,
      joinCond: org.apache.spark.sql.Column,
      dimVal: org.apache.spark.sql.Column,
      watermarkDelay: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .join(broadcast(dim), joinCond)
      .groupBy(window(col("ts"), windowLen), dimVal.as("dim"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("dim"), col("n"))

  /** Watermarked stream-stream interval join — the attribution shape:
    * each left-stream event (e.g. a view) matches right-stream events
    * (e.g. clicks) of the SAME user inside `[l_ts, l_ts + horizonSec]`.
    * Both sides carry a watermark and the join condition bounds the
    * right side's event time relative to the left's, so Spark derives
    * state-eviction bounds on BOTH join buffers: state is
    * horizon+lateness-bounded, never the whole stream — the property
    * that makes a forever-running 100 TB attribution join feasible.
    * Inner-join matches emit as soon as both rows have arrived (no
    * watermark wait), keyed-shuffled on user — no broadcast, both
    * sides unbounded.
    */
  /** With `joinType = "left_outer"`, a left event with no in-horizon
    * match emits once the watermark passes its horizon (r_id/delta_us
    * null) — the funnel-loss report as a stream. Outer emission needs
    * event-time progress PAST the horizon on both inputs; note the
    * type filters run before the watermark nodes, so
    * watermark-advancing rows must carry the filtered types.
    */
  def intervalJoin(
      events: DataFrame,
      leftType: String,
      rightType: String,
      horizonSec: Long,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id").as("user_id"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", watermarkDelay)
    val r = events.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts").as("r_ts"))
      .withWatermark("r_ts", watermarkDelay)
    l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSec SECONDS"),
        joinType)
      .select(col("l_id"), col("r_id"), col("user_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("delta_us"))
  }

  /** Gap-based sessionization with custom state
    * (`flatMapGroupsWithState`, event-time timeout): a session emits
    * only when the WATERMARK passes its end + gap — until then no
    * in-watermark event can be ruled out as a member, so emitting
    * earlier (e.g. a straggler chain closed the moment a newer chain
    * exists) can split a session a later bridging event would have
    * joined. State per key is every not-yet-sealed chain — bounded by
    * the watermark horizon (at most delay/gap + 2 chains).
    *
    * Exactness: for any in-watermark delivery order, the emitted
    * sessions equal the batch oracle's globally-sorted pass (each
    * chain is an atom; the merge sweep below is that pass). Events
    * older than the watermark are dropped by Spark before this
    * operator — that loss is the streaming contract, not this op's.
    * At-least-once transports must dedup upstream ([[dedupExact]]):
    * a transport DUPLICATE of an in-watermark event inflates
    * `n_events` (the (start, end, n) state cannot know past ids).
    *
    * Streaming-only semantics: a key's final chains emit only when
    * the watermark advances past them, which needs a later event. On
    * bounded/batch input use [[sessionWindows]] or the declared
    * `q_sessionize` query — those flush everything.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .filter((e: Event) => e.ts != null) // a null event time would
        // NPE the sweep (and wedge the query on checkpoint replay)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenChains, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[OpenChains]) =>
          def toSession(s: OpenSession): Session =
            Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
          val gapMs = gapSeconds * 1000L
          // Sweep the held chains (atoms — their internal events are
          // within gap by construction) and the batch events together
          // in start order: exactly the batch oracle's globally-sorted
          // pass. Chain ends are monotone across the sweep (merge
          // takes max-end; a new chain starts > end + gap), so
          // comparing against the LAST chain suffices. The unified
          // body also serves the timeout invocation (empty batch):
          // the sweep over already-disjoint chains is the identity
          // and only the seal step below acts.
          val items: Seq[OpenSession] =
            (state.getOption.map(_.chains).getOrElse(Seq.empty) ++
              batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
                .map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1)))
              .sortBy(s => (s.start, s.end))
          var chains = Vector.empty[OpenSession]
          items.foreach { it =>
            chains.lastOption match {
              case Some(s) if it.start - s.end <= gapMs =>
                chains = chains.init :+ OpenSession(
                  math.min(s.start, it.start),
                  math.max(s.end, it.end), s.n + it.n)
              case _ => chains = chains :+ it
            }
          }
          // seal: a chain emits once the watermark passes end + gap —
          // any future in-watermark event has ts > wm ≥ end + gap and
          // provably cannot merge into it
          val wm = state.getCurrentWatermarkMs()
          val (sealedChains, open) =
            chains.partition(_.end + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenChains(open))
            // strictly > wm by the partition above, as Spark requires
            state.setTimeoutTimestamp(open.map(_.end + gapMs).min)
          }
          sealedChains.map(toSession).iterator
      }
  }
}
