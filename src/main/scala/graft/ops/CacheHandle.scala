package graft.ops

import org.apache.spark.sql.DataFrame

/** Lifecycle handle for operators that persist intermediate frames
  * internally ([[TextDedup.minhashDedup]]'s shingle/band sets, the
  * [[ScaleOps]] prefix-offset shapes). Verify/Bench clear the whole
  * cache between queries, but a long-lived library caller running many
  * invocations in one session would otherwise accumulate executor
  * memory until eviction pressure hurts: pass a handle, consume the
  * result, then `release()`.
  *
  * {{{
  *   val h = new CacheHandle
  *   val pairs = TextDedup.minhashDedup(docs, "id", "text", handle = h)
  *   pairs.write.parquet(out)   // consume FIRST —
  *   h.release()                // release drops the backing caches
  * }}}
  *
  * Not thread-safe (one handle per pipeline invocation); releasing
  * twice is a no-op.
  */
final class CacheHandle {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and remember it for [[release]]. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    tracked += df.persist()
    df
  }

  /** Unpersist everything this handle's pipeline cached. Safe to call
    * once the results have been consumed (an action ran); lazy results
    * read after release simply recompute.
    */
  def release(): Unit = {
    tracked.foreach(_.unpersist())
    tracked.clear()
  }
}

object CacheHandle {
  /** Persist via `h`, or — when the caller passed no handle (`null`)
    * — via the session-wide [[QueryCaches]] ledger: the pipelines
    * persist for correctness / shared-subplan reuse either way; the
    * handle only changes who cleans up. Routing the no-handle case
    * through the ledger means a harness (Verify/Bench) or a long-lived
    * caller can reclaim every op-internal cache with one
    * [[QueryCaches.releaseAll]] instead of leaking them for the
    * session lifetime.
    */
  private[graft] def persistWith(h: CacheHandle, df: DataFrame): DataFrame =
    if (h == null) QueryCaches.persist(df) else h.persist(df)
}

/** Session-wide cache ledger for the DECLARED queries and for ops
  * invoked without an explicit [[CacheHandle]]. The declared queries
  * in [[graft.SparkEntry]] are plain `(session, dir) => DataFrame`
  * functions — they cannot release their own caches because release
  * must happen after the caller's action — so their internal persists
  * register here and the harness calls [[releaseAll]] once each
  * result is materialized (Verify after the parquet write, Bench
  * after the noop sink). Library callers composing ops directly
  * should prefer a per-pipeline [[CacheHandle]]; this ledger is the
  * backstop that makes "forgot the handle" a bounded cost instead of
  * a session-lifetime leak.
  */
object QueryCaches {
  private val handles =
    scala.collection.mutable.ArrayBuffer.empty[CacheHandle]

  private def fresh(): CacheHandle = synchronized {
    val h = new CacheHandle
    handles += h
    h
  }

  /** A ledger-tracked handle to pass into handle-accepting ops. */
  def handle(): CacheHandle = fresh()

  /** Persist `df` under the ledger (chainable via `.transform`). */
  def persist(df: DataFrame): DataFrame = fresh().persist(df)

  /** Unpersist every ledger-tracked cache. Call after the current
    * query's result has been materialized.
    */
  def releaseAll(): Unit = synchronized {
    handles.foreach(_.release())
    handles.clear()
  }
}
