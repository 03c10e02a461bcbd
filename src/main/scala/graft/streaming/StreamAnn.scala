package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.CosineLsh

/** Streaming embedding near-dup detection — the vector-modality twin
  * of [[StreamDedup]]: new vectors are matched against the standing
  * in-horizon corpus as they ARRIVE, instead of re-mining pairs batch.
  *
  * Shape mirrors the batch LSH pair miner exactly: the bucket id is
  * the seeded random-hyperplane signature (a pure per-row function, no
  * shuffle), and matching is keyed state per bucket
  * (`flatMapGroupsWithState`) — a new vector is compared only against
  * same-bucket vectors inside the watermark horizon, the bucket-local
  * work the batch equi-join does. State stores (id, ts, vector, norm)
  * per member, evicted by the event-time horizon, with wholesale
  * timeout for idle buckets.
  *
  * Determinism: cosines fold left-to-right (same order as the batch
  * `DotProduct` expression), and the threshold compares the
  * HALF_UP-6-rounded value — the exact comparison the batch
  * `round(cos, 6) >= tau` filter performs — so the streamed pair set
  * equals the batch LSH pair set when all arrivals share the horizon.
  */
object StreamAnn {

  final case class Vec(vec_id: Long, ts: Timestamp, embedding: Seq[Double])

  final case class BucketRow(
      bucket: Int,
      vec_id: Long,
      ts: Timestamp,
      v: Seq[Double],
      nrm: Double)

  final case class VecPair(a: Long, b: Long, ts: Timestamp, cos: Double)

  // public: the state encoder's generated code instantiates it
  final case class BucketState(vecs: List[(Long, Long, Seq[Double], Double)])

  /** Left-to-right dot product — the same fold order as the batch
    * [[graft.expr.DotProduct]] codegen, so cosines are bit-identical.
    */
  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Spark's `round(x, 6)`: BigDecimal HALF_UP — matching the batch
    * filter's rounding exactly (threshold compares the rounded value).
    */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // Array overload for the plane dots: planes stay primitive
  // double[] — no per-row copies, no boxing in the signature loop
  // (the state rows keep Seq[Double] for the encoder's sake)
  private def dotSA(a: Seq[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Sign-bit bucket of the seeded plane matrix — the local twin of
    * [[CosineLsh.bucketCol]] (same planes, same `>= 0` convention).
    */
  def bucketOf(v: Seq[Double], planes: Array[Array[Double]]): Int = {
    var acc = 0
    var p = 0
    while (p < planes.length) {
      if (dotSA(v, planes(p)) >= 0d) acc |= 1 << p
      p += 1
    }
    acc
  }

  /** Near-dup pairs over a stream of (vec_id, ts, embedding):
    * (a, b, ts, cos) for same-bucket pairs whose rounded cosine meets
    * `threshold`. Zero-norm vectors never match (cosine undefined —
    * the batch `withNorm` drop).
    */
  def candidatePairs(
      vecs: Dataset[Vec],
      k: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      threshold: Double = 0.2,
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 10 * 60 * 1000L): Dataset[VecPair] = {
    import vecs.sparkSession.implicits._
    val planes = CosineLsh.planes(k, dim, seed)
    val banded: Dataset[BucketRow] = vecs.flatMap { r =>
      // null-safe: a null embedding would NPE the task and wedge the
      // query (checkpoint replays the poisoned batch forever)
      if (r.embedding == null) None
      else {
      val nrm = math.sqrt(dot(r.embedding, r.embedding))
      if (nrm > 0)
        Some(BucketRow(bucketOf(r.embedding, planes),
          r.vec_id, r.ts, r.embedding, nrm))
      else None
      }
    }
    banded
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, VecPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Int, batch: Iterator[BucketRow], state: GroupState[BucketState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrivals = batch.toSeq.sortBy(r => (r.ts.getTime, r.vec_id))
            var seen = state.getOption.map(_.vecs).getOrElse(Nil)
            val out = List.newBuilder[VecPair]
            var maxTs = seen.map(_._2).maxOption.getOrElse(0L)
            arrivals.foreach { r =>
              val t = r.ts.getTime
              maxTs = math.max(maxTs, t)
              seen = seen.filter { case (_, ts0, _, _) =>
                maxTs - ts0 <= horizonMs }
              // at-least-once sources re-deliver: a vec_id already in
              // state has already emitted its pairs, so skip it — both
              // the re-emission (keeps the pair stream exactly-once
              // per pair without a downstream distinct) and the state
              // append (keeps state size O(unique vectors in horizon))
              if (!seen.exists(_._1 == r.vec_id)) {
                seen.foreach { case (id0, _, v0, n0) =>
                  val cos = dot(v0, r.v) / (n0 * r.nrm)
                  if (round6(cos) >= threshold)
                    out += VecPair(
                      math.min(id0, r.vec_id), math.max(id0, r.vec_id),
                      r.ts, cos)
                }
                seen = (r.vec_id, t, r.v, r.nrm) :: seen
              }
            }
            state.update(BucketState(seen))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.result().iterator
          }
      }
  }
}
