package graft.streaming

import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-dup detection — the incremental counterpart
  * of the batch `TextDedup.minhashDedup` pipeline, for catching
  * duplicates as documents ARRIVE instead of re-scanning the corpus.
  *
  * Shape: the signature is a pure per-document function (no shuffle —
  * computed in a `map`), LSH bands explode one row per (doc, band),
  * and candidate matching is keyed state per band bucket
  * (`flatMapGroupsWithState`): a new document is compared only against
  * the documents that collided in the same bucket within the watermark
  * horizon, exactly the bucket-local work the batch join does. State
  * is bounded two ways — per-bucket entries older than the event-time
  * horizon are evicted on every invocation, and an idle bucket times
  * out wholesale.
  *
  * Output: (a, b, ts, est_jaccard) where the estimate is the matching
  * signature fraction — the standard MinHash property E[matches/k] =
  * J(a,b) — so no shingle sets are ever stored in state, only k hex
  * strings per document. A pair that collides in several bands is
  * emitted once per band; consumers wanting unique pairs apply
  * `dropDuplicatesWithinWatermark` or a downstream distinct.
  */
object StreamDedup {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  final case class BandRow(
      band_idx: Int,
      band_val: String,
      doc_id: Long,
      ts: Timestamp,
      sig: Seq[String])

  final case class CandidatePair(
      a: Long,
      b: Long,
      ts: Timestamp,
      est_jaccard: Double)

  // public: the state encoder's generated code instantiates it
  final case class BucketState(docs: List[(Long, Long, Seq[String])]) // (id, tsMs, sig)

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Per-document MinHash signature: same scheme as the batch
    * `TextDedup.minhashSignatures` (single-space tokens, distinct
    * n-token shingles, one md5 per group of four 8-hex-char minhash
    * slots — the digest-packing layout MUST stay in lockstep with the
    * batch side, the streamed pairs hash-compare against the batch
    * oracle), computed locally — a pure function of one document, no
    * aggregation. None when the document has fewer than `shingleN`
    * tokens.
    */
  def minhashSignature(
      text: String,
      shingleN: Int,
      numHashes: Int): Option[Seq[String]] = {
    // strip ASCII SPACES only — Spark's trim() semantics. Java
    // String.trim strips every char <= U+0020 (\n, \t, …), so a text
    // with a trailing newline would tokenize differently here than in
    // TextDedup.tokens and the signatures would silently diverge from
    // the batch oracle the scaladoc promises lockstep with.
    // null-safe: one null payload would otherwise NPE the executor
    // task, exhaust retries, and WEDGE the query permanently (the
    // checkpoint replays the same micro-batch on every restart)
    if (text == null) return None
    val toks = text.dropWhile(_ == ' ')
      .reverse.dropWhile(_ == ' ').reverse.split(" ")
    if (toks.length < shingleN) None
    else {
      val shingles = toks.sliding(shingleN).map(_.mkString(" ")).toSet
      val nGroups = (numHashes + 3) / 4
      val digests = shingles.toSeq
        .map(s => (0 until nGroups).map(g => md5Hex(s"$g:$s")))
      Some((0 until numHashes).toSeq.map { k =>
        digests.map(_(k / 4).substring((k % 4) * 8, (k % 4) * 8 + 8)).min
      })
    }
  }

  /** Candidate near-dup pairs over a stream of (doc_id, ts, text).
    *
    * @param horizonMs   how long a document stays matchable (state
    *                    eviction bound, aligned with the watermark)
    * @param threshold   minimum estimated Jaccard (matches/numHashes)
    */
  def candidatePairs(
      docs: Dataset[Doc],
      shingleN: Int = 3,
      numHashes: Int = 6,
      bands: Int = 3,
      threshold: Double = 0.5,
      watermarkDelay: String = "10 minutes",
      horizonMs: Long = 10 * 60 * 1000L): Dataset[CandidatePair] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    import docs.sparkSession.implicits._
    val rows = numHashes / bands
    val banded: Dataset[BandRow] = docs.flatMap { d =>
      minhashSignature(d.text, shingleN, numHashes).toSeq.flatMap { sig =>
        (0 until bands).map { b =>
          val bandVal = sig.slice(b * rows, (b + 1) * rows).mkString
          BandRow(b, bandVal, d.doc_id, d.ts, sig)
        }
      }
    }
    banded
      .withWatermark("ts", watermarkDelay)
      .groupByKey(r => (r.band_idx, r.band_val))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), batch: Iterator[BandRow],
         state: GroupState[BucketState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrivals = batch.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var seen = state.getOption.map(_.docs).getOrElse(Nil)
            val out = List.newBuilder[CandidatePair]
            var maxTs = seen.map(_._2).maxOption.getOrElse(0L)
            arrivals.foreach { r =>
              val t = r.ts.getTime
              maxTs = math.max(maxTs, t)
              // evict entries that fell out of the horizon
              seen = seen.filter { case (_, ts0, _) => maxTs - ts0 <= horizonMs }
              // at-least-once sources re-deliver: a doc_id already in
              // state has already emitted its pairs, so skip it — both
              // the re-emission (pair stream stays exactly-once per
              // pair per band) and the state append (state stays
              // O(unique docs in horizon))
              if (!seen.exists(_._1 == r.doc_id)) {
                seen.foreach { case (id0, _, sig0) =>
                  val matches = sig0.iterator.zip(r.sig.iterator)
                    .count { case (x, y) => x == y }
                  val est = matches.toDouble / r.sig.length
                  if (est >= threshold)
                    out += CandidatePair(
                      math.min(id0, r.doc_id), math.max(id0, r.doc_id),
                      r.ts, est)
                }
                seen = (r.doc_id, t, r.sig) :: seen
              }
            }
            state.update(BucketState(seen))
            // idle buckets die once the watermark passes the horizon
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.result().iterator
          }
      }
  }

  /** Batch twin over the same signature function — used by the parity
    * spec: all same-bucket pairs with estimated Jaccard >= threshold.
    */
  def candidatePairsBatch(
      docs: DataFrame, // doc_id, text
      shingleN: Int = 3,
      numHashes: Int = 6,
      bands: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    val banded = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        minhashSignature(text, shingleN, numHashes).toSeq.flatMap { sig =>
          (0 until bands).map { b =>
            (b, sig.slice(b * rows, (b + 1) * rows).mkString, id, sig)
          }
        }
      }
      .toDF("band_idx", "band_val", "doc_id", "sig")
      // both self-join sides read it; ledger-tracked (the bare-persist
      // rule) so Verify/Bench and library callers can reclaim it
      .transform(graft.ops.QueryCaches.persist)
    banded.as("x")
      .join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (size(filter(zip_with(col("x.sig"), col("y.sig"),
          (p, q) => when(p === q, lit(1))), m => m.isNotNull))
          .cast("double") / lit(numHashes)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .distinct()
  }
}
