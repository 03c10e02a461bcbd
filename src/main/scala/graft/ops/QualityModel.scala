package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trainable quality classifier for corpus curation — the
  * fastText-style "distill the heuristic gates into a model" step a
  * training-data pipeline runs so the filter can later generalize past
  * its hand-written rules. A logistic regression is trained by full-
  * batch gradient descent over per-document quality features; labels
  * come from the deterministic rule ([[Corpus.qualityPass]]'s
  * thresholds), so the whole pipeline is self-contained and
  * oracle-checkable.
  *
  * Scale stance: each iteration is ONE keyed-less aggregate over the
  * persisted feature frame (map-side partial sums of 4 gradient
  * components); the driver holds only the 4-double weight vector and
  * the scalar row count — constant-bounded, like the k-means
  * centroids and the BPE argmax. Iteration count is fixed (no
  * convergence probe), so the job/shuffle count is a static property.
  *
  * Cross-engine exactness: gradient components are summed as
  * DECIMAL(28,14) (order-independent exact sums — the q_corr_exact
  * moments treatment), so accumulation order cannot move the result;
  * the only engine-sensitive ops left are exp() and the final double
  * rounding, whose ≤1-ulp drift sits ~8 orders below the round(…,6)
  * gate.
  */
object QualityModel {

  /** Per-document features + rule label:
    * (idCol, y, x0=1, x1=n_tokens/100, x2=stopword ratio,
    * x3=chars/1000). Null-text rows are dropped on both engines.
    */
  def featurize(
      df: DataFrame,
      idCol: String,
      textCol: String,
      stopWords: Seq[String] = Corpus.defaultStopWords): DataFrame = {
    val tk = TextDedup.tokens(col(textCol))
    val nTok = size(tk)
    val nStop = size(filter(tk, x => x.isInCollection(stopWords)))
    val lenText = length(col(textCol))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        when(lenText.between(20, 2000) && nTok >= 5 &&
          (nStop.cast("double") / nTok.cast("double")) <= 0.5,
          lit(1.0)).otherwise(lit(0.0)).as("y"),
        lit(1.0).as("x0"),
        (nTok.cast("double") / lit(100.0)).as("x1"),
        (nStop.cast("double") / nTok.cast("double")).as("x2"),
        (lenText.cast("double") / lit(1000.0)).as("x3"))
  }

  /** z = ((w0·x0 + w1·x1) + w2·x2) + w3·x3 — the association is part
    * of the contract: the oracle's unrolled SQL writes the identical
    * expression so both engines run the same IEEE operation sequence.
    */
  private def zCol(w: Array[Double]) =
    lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  private def sigmoid(z: org.apache.spark.sql.Column) =
    lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch GD: w ← w − lr·(Σ(σ(w·x) − y)·x_j)/n per component,
    * starting from w = 0 (σ(0) = 0.5 exactly — iteration 1 has no
    * exp() at all). Returns the weight vector after `iters` rounds.
    */
  def trainLogReg(
      feats: DataFrame,
      iters: Int,
      lr: Double,
      handle: CacheHandle = null): Array[Double] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val f = CacheHandle.persistWith(handle, feats)
    val n = f.count().toDouble
    require(n > 0, "cannot train on an empty feature frame")
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val err = sigmoid(zCol(w)) - col("y")
      val g: Row = f.select(
        (0 to 3).map(j =>
          sum((err * col(s"x$j")).cast(DecimalType(28, 14))).as(s"g$j")): _*)
        .head()
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (g.getDecimal(j).doubleValue / n)
      }
    }
    w
  }

  /** Per-document score under a trained model: round(σ(z), 6) plus the
    * stable prediction round(z, 6) > 0 (thresholding the ROUNDED
    * logit, not the raw sigmoid, so a ≤1-ulp cross-engine drift in
    * exp() can never flip a prediction at the 0.5 boundary).
    */
  def scoreLogReg(feats: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == 4, s"expected 4 weights, got ${w.length}")
    val z = zCol(w)
    feats.select(col(feats.columns.head), col("y"),
      round(sigmoid(z), 6).as("score_r"),
      (round(z, 6) > 0).as("pred"))
  }
}
