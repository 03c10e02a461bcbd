package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** Streaming trending-terms: watermarked tumbling-window token counts
  * over a text stream. The stream side is intentionally only the
  * windowed count — tokenization/explode is stateless, the count's
  * state is (window, token)-keyed and evicted when the watermark
  * passes the window end. Ranking "top k per closed window" is a
  * batch concern on the emitted counts (the serving layer's job):
  * append-mode windows are immutable once flushed, so the rank never
  * has to be revised — which is what keeps the streaming state
  * bounded.
  *
  * Scale stance: state is one row per (window, distinct token in
  * window), not per event; the explode never shuffles (partial counts
  * combine map-side before the single keyed exchange per micro-batch).
  */
object TrendingTerms {

  /** Tumbling-window per-token counts: (window_start, window_end,
    * tok, n), append-flushed after the watermark passes each window.
    */
  def windowedTermCounts(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String,
      windowLen: String): DataFrame =
    docs.withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol),
        explode(TextDedup.tokens(col(textCol))).as("tok"))
      .groupBy(window(col(tsCol), windowLen), col("tok"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("tok"), col("n"))
}
