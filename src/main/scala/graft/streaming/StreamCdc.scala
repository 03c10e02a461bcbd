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
  * State is one version Long per ever-seen key (NoTimeout — a real
  * deployment bounds it with a key-expiry timeout when the key domain
  * churns). Within a micro-batch arrivals apply in (ver) order — the
  * same total order the batch oracle ranks by — so the applied set is
  * deterministic for any batch slicing.
  */
object StreamCdc {

  // public: Spark's codegen instantiates encoder/state classes
  final case class Change(key: Long, ver: Long, op: String, value: Double)
  final case class CdcState(ver: Long)

  /** Applied changes only, from a stream carrying `key`, `ver`
    * (monotone per-key version, e.g. the change's commit timestamp),
    * `op` ("U" upsert / "D" delete) and `value` (the post-image).
    */
  def applyChangelog(changes: DataFrame): Dataset[Change] = {
    val s = changes.sparkSession
    import s.implicits._
    changes.select(col("key"), col("ver"), col("op"), col("value"))
      .as[Change]
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, batch, state) =>
          val sorted = batch.toSeq.sortBy(_.ver)
          var st = state.getOption.getOrElse(CdcState(Long.MinValue))
          val out = Seq.newBuilder[Change]
          sorted.foreach { c =>
            if (c.ver > st.ver) {
              out += c
              st = CdcState(c.ver)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
