package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** CDC-changelog application at the stream edge — the materialized-
  * view-maintenance shape: a keyed stream of versioned changes
  * (upserts and deletes, possibly re-delivered or out of order, as
  * every at-least-once CDC transport produces) is applied so that
  * each key's version only ever moves FORWARD. The operator emits the
  * post-image of every APPLIED change; stale and duplicate versions
  * are suppressed at the edge, so a downstream "latest per key" read
  * (one keyed argmax) serves the maintained table without replaying
  * history.
  *
  * State is one composite version (ver, sub) per ever-seen key
  * (NoTimeout — a real deployment bounds it with a key-expiry timeout
  * when the key domain churns). The version is COMPOSITE because a
  * commit-timestamp major version alone is not a total order — CDC
  * transports batch same-timestamp changes routinely, and a strict
  * `>` on a tied major version silently drops the later change while
  * a batch oracle with no tiebreak ranks it nondeterministically.
  * `sub` (e.g. the change's log sequence / event id) completes the
  * order; within a micro-batch arrivals apply in (ver, sub) order —
  * the same total order the batch oracle ranks by — so the applied
  * set is deterministic for any batch slicing.
  */
object StreamCdc {

  // public: Spark's codegen instantiates encoder/state classes
  final case class Change(
      key: Long, ver: Long, sub: Long, op: String, value: Double,
      payload: String)
  final case class CdcState(ver: Long, sub: Long)

  /** Applied changes only, from a stream carrying `key`, `ver`
    * (per-key major version, e.g. the change's commit timestamp),
    * `sub` (minor version completing the per-key total order, e.g.
    * the log sequence number), `op` ("U" upsert / "D" delete),
    * `value` and `payload` (the post-image).
    */
  def applyChangelog(changes: DataFrame): Dataset[Change] = {
    val s = changes.sparkSession
    import s.implicits._
    changes.select(col("key"), col("ver"), col("sub"), col("op"),
        col("value"), col("payload"))
      .as[Change]
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, batch, state) =>
          val sorted = batch.toSeq.sortBy(c => (c.ver, c.sub))
          var st = state.getOption
            .getOrElse(CdcState(Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[Change]
          sorted.foreach { c =>
            if (c.ver > st.ver || (c.ver == st.ver && c.sub > st.sub)) {
              out += c
              st = CdcState(c.ver, c.sub)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
