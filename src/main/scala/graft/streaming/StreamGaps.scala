package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Silence detection over a keyed event stream — the heartbeat/outage
  * monitor: for each key, emit a row whenever the time between two
  * consecutive events exceeds a threshold. The batch analogue is a
  * per-key `lag` window; the streaming form keeps ONE (last-seen
  * second, tiebreak id) pair per key in `flatMapGroupsWithState` and
  * closes gaps the moment the ending event arrives.
  *
  * State is deliberately NoTimeout: a gap ends when the next event
  * arrives, HOWEVER late — expiring the state would silently restart
  * the clock and swallow the longest (most interesting) gaps. The
  * cost is one tiny fixed record per ever-seen key; a deployment that
  * must bound key cardinality layers an explicit retention sweep on
  * top rather than a watermark timeout. Within a micro-batch arrivals
  * are sorted by (second, event_id) — the same total order the batch
  * oracle uses; cross-batch reordering is bounded by the source's
  * file-arrival order (the gate's ingest-dir layout), as with every
  * at-least-once file feed.
  */
object StreamGaps {

  // public: Spark's codegen instantiates encoder/state classes
  final case class GapEvent(user_id: Long, ts_sec_l: Long, event_id: Long)
  final case class GapState(lastSec: Long, lastId: Long)
  final case class Gap(
      user_id: Long, gap_start_s: Long, gap_end_s: Long, gap_sec: Long)

  /** @param events raw event stream carrying `ts_ns` (epoch nanos),
    *               `user_id`, `event_id`
    */
  def detectGaps(events: DataFrame, gapSeconds: Long): Dataset[Gap] = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("user_id"),
        expr("ts_ns div 1000000000").as("ts_sec_l"),
        col("event_id"))
      .as[GapEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, Gap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, batch, state) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_sec_l, e.event_id))
          var last = state.getOption
          val out = scala.collection.mutable.Buffer.empty[Gap]
          sorted.foreach { e =>
            last.foreach { p =>
              if (e.ts_sec_l - p.lastSec > gapSeconds)
                out += Gap(uid, p.lastSec, e.ts_sec_l, e.ts_sec_l - p.lastSec)
            }
            // the frontier only moves FORWARD: a cross-batch late
            // arrival older than the stored last-event must not drag
            // lastSec backward — it would emit a spurious gap from the
            // stale timestamp and swallow the real one at the frontier
            // (gaps the late event itself closed are already emitted —
            // inherent to append-mode streaming, documented above)
            if (last.forall(p => e.ts_sec_l > p.lastSec ||
                (e.ts_sec_l == p.lastSec && e.event_id > p.lastId)))
              last = Some(GapState(e.ts_sec_l, e.event_id))
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
