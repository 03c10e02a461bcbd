package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Per-key rate limiting over an event stream — the ingestion-quota
  * shape: each user may emit at most `k` events per quota period (clock hour by default); the
  * overflow is dropped at the edge before it ever reaches (and skews)
  * the corpus. The batch analogue is a (user, hour) row_number ≤ k;
  * the streaming form keeps ONE (current hour, count) pair per key in
  * `flatMapGroupsWithState` and decides admission the moment an event
  * arrives.
  *
  * State is deliberately NoTimeout and O(k) per ever-seen key (the
  * current hour, its count, and the ≤k admitted event ids — the hour
  * ROLLS, it does not accumulate); within a micro-batch arrivals are
  * sorted by (ts_ns, event_id), the same total order the batch oracle
  * ranks by, so the admitted set is deterministic for any batch
  * slicing that preserves hour locality — the gate feeds the whole
  * table as one initial batch. The admitted-id set is the
  * at-least-once redelivery guard (the StreamDedup/StreamAnn rule): a
  * transport duplicate of an ADMITTED event must neither re-emit nor
  * burn quota — without it, one duplicate both double-emitted and
  * later rejected a legitimate event the batch oracle admits.
  */
object StreamQuota {

  // public: Spark's codegen instantiates encoder/state classes
  final case class QuotaEvent(user_id: Long, ts_ns: Long, event_id: Long)
  final case class QuotaState(hour: Long, n: Long, admitted: Seq[Long])

  val HourNs: Long = 3600L * 1000000000L
  val DayNs: Long = 24L * HourNs

  /** Admitted events only, from a stream carrying `user_id`, `ts_ns`
    * (epoch nanos), `event_id`; `bucketNs` is the quota period (hour
    * by default — pass [[DayNs]] for daily quotas).
    */
  def perUserHourly(
      events: DataFrame, k: Int, bucketNs: Long = HourNs): Dataset[QuotaEvent] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(bucketNs >= 1, s"bucketNs must be >= 1, got $bucketNs")
    val s = events.sparkSession
    import s.implicits._
    events.select(col("user_id"), col("ts_ns"), col("event_id"))
      .as[QuotaEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[QuotaState, QuotaEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, batch, state) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts_ns, e.event_id))
          var st = state.getOption
            .getOrElse(QuotaState(Long.MinValue, 0L, Vector.empty))
          // the dedup lookup runs per EVENT: mirror the admitted ids
          // into a Set so large quotas stay O(1) per arrival (a Seq
          // `contains` + append made the batch O(k²) per key); the
          // STATE row keeps the Seq encoding unchanged. The appended
          // collection must be a Vector — `:+` on the default List
          // re-copies the whole list per admission, the same
          // quadratic shape in disguise
          var admitted = st.admitted.toSet
          if (!st.admitted.isInstanceOf[Vector[_]])
            st = st.copy(admitted = st.admitted.toVector)
          val out = Seq.newBuilder[QuotaEvent]
          sorted.foreach { e =>
            val hour = Math.floorDiv(e.ts_ns, bucketNs)
            // the bucket rolls FORWARD only: a late event from an
            // already-rolled-past bucket must not reset the counter —
            // `!=` let one stale arrival zero the live hour's count
            // and re-admit past the quota (stale events are dropped;
            // their own bucket's budget closed when the state rolled)
            if (hour > st.hour) {
              st = QuotaState(hour, 0L, Vector.empty)
              admitted = Set.empty
            }
            if (hour == st.hour && !admitted(e.event_id) && st.n < k) {
              out += e
              st = QuotaState(st.hour, st.n + 1, st.admitted :+ e.event_id)
              admitted += e.event_id
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
