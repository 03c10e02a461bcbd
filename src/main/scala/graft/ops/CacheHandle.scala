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
  /** Persist via `h`, or plainly when the caller passed no handle
    * (`null`): the pipelines persist for correctness / shared-subplan
    * reuse either way; the handle only changes who cleans up.
    */
  private[graft] def persistWith(h: CacheHandle, df: DataFrame): DataFrame =
    if (h == null) df.persist() else h.persist(df)
}
