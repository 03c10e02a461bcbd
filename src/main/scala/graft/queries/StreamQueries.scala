package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStream

/** Declared query for the Structured-Streaming surface: the events
  * table flows through the REAL streaming sessionizer (`session_window`
  * + watermark, append mode) and the emitted sessions are checked
  * against a batch gap-and-islands oracle — streaming and batch share
  * semantics, proven by the driver's hash compare, not just by spec.
  *
  * Harness notes: `MemoryStream` requires local rows by definition
  * (same mechanics as `StreamingSpec`); the bounded collect here is
  * stream-harness ingestion, not operator design — production
  * ingestion is `EventStream.fromEventsDir`/Kafka and the operator's
  * state stays keyed and watermark-bounded regardless of the source.
  * Two far-future sentinel batches advance the watermark past every
  * real session (the watermark a batch acts on comes from the previous
  * batch's max event time), flushing all append-mode output.
  */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Streaming exact dedup: documents stream through
    // dropDuplicatesWithinWatermark on the normalized fingerprint
    // (watermark-bounded state). Projecting only `fp` makes the
    // output deterministic regardless of arrival order — exactly the
    // distinct fingerprint set — so the batch oracle is SELECT
    // DISTINCT. Event time is synthesized from doc_id (the documents
    // table has no timestamp column).
    "q_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          // offset past epoch 0: a row whose event time equals the
          // stream's initial watermark would be dropped as late
          timestamp_seconds(col("doc_id") + lit(1000000000L)).as("ts"))
        .as[(Long, String, Timestamp)].collect()
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String, Timestamp)]
      val deduped = EventStream.dedupExact(
        input.toDF().toDF("doc_id", "text", "ts"),
        textCol = "text", tsCol = "ts")
      val sink = "q_stream_dedup_sink"
      val q = deduped.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        input.addData(docs.toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).select(col("fp")).orderBy("fp")
    }),

    "q_stream_sessions" -> ((s, dir) => {
      import s.implicits._
      val evts = Tables.events(s, dir)
        .select(col("event_id"), col("ts_sec").as("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[EventStream.Event].collect()
      // empty input: zero sessions, well-defined (the oracle returns
      // zero rows too); without the guard the sentinel math below
      // would throw on max of an empty iterator
      if (evts.isEmpty) {
        Seq.empty[(Long, Long, Long, Long)]
          .toDF("user_id", "start_s", "end_s", "n_events")
      } else {
        val maxMs = evts.iterator.map(_.ts.getTime).max
        implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
        val input = MemoryStream[EventStream.Event]
        val sessions = EventStream.sessionWindows(
          input.toDF(), gap = "30 minutes",
          watermarkDelay = Some("30 minutes"))
        val sink = "q_stream_sessions_sink"
        val q = sessions.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          input.addData(evts.toIndexedSeq)
          q.processAllAvailable()
          input.addData(EventStream.Event(-1L,
            new Timestamp(maxMs + 7200000L), -1L, "sentinel", 0.0))
          q.processAllAvailable()
          input.addData(EventStream.Event(-2L,
            new Timestamp(maxMs + 10800000L), -1L, "sentinel", 0.0))
          q.processAllAvailable()
        } finally q.stop()
        s.table(sink)
          .filter(col("user_id") >= 0)
          .select(col("user_id"),
            unix_timestamp(col("session_start")).as("start_s"),
            unix_timestamp(col("session_end")).as("end_s"),
            col("n_events"))
          .orderBy("user_id", "start_s")
      }
    }))

  val oracles: Map[String, String] = Map(
    "q_stream_dedup" ->
      """SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
         FROM documents ORDER BY fp""",
    // gap-and-islands sessions over second-truncated event times:
    // same-session ⟺ gap to previous event ≤ 1800 s; session end =
    // last event + gap (session_window semantics)
    "q_stream_sessions" ->
      """WITH e AS (SELECT user_id,
             CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS BIGINT) AS ts_s
           FROM events),
         l AS (SELECT user_id, ts_s,
             lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) AS prev
           FROM e),
         f AS (SELECT user_id, ts_s,
             CASE WHEN prev IS NULL OR ts_s - prev > 1800 THEN 1 ELSE 0 END AS new_s
           FROM l),
         g AS (SELECT user_id, ts_s,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM f),
         sess AS (SELECT user_id, min(ts_s) AS start_s,
             max(ts_s) + 1800 AS end_s, count(*) AS n_events
           FROM g GROUP BY user_id, sid)
         SELECT user_id, CAST(start_s AS BIGINT) AS start_s,
           CAST(end_s AS BIGINT) AS end_s, n_events
         FROM sess ORDER BY user_id, start_s""")
}
