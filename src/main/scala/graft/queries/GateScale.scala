package graft.queries

/** Gate-scale knob settings shared by the declared (oracle-gated)
  * queries. The correctness gates run at sf <= 0.1 against a DuckDB
  * oracle that computes the UNCAPPED answer, so every approximation
  * knob that exists for 100 TB safety must be switched off at the
  * gates to stay hash-exact — this object is the single place that
  * choice is made and explained.
  */
object GateScale {

  /** Per-key degree cap for [[graft.ops.GraphOps.coOccurrenceEdges]]
    * at the oracle gates: uncapped.
    *
    * The co-occurrence fold is quadratic in per-key degree — one hot
    * key (a buyer touching every supplier) makes the self-join blow
    * up, which is why `maxKeyDegree` exists and `CoOccurrenceSpec`
    * exercises the capped path (TextDedup.capBuckets underneath).
    * The gates pass `uncapped` deliberately: the DuckDB oracle has no
    * cap, and the gate-scale corpora have bounded degrees, so the
    * exact fold is both affordable and the only hash-matchable
    * answer.
    *
    * PRODUCTION GUIDANCE: at 100 TB callers must set a finite cap
    * (hundreds to a few thousand — at most rows/cap keys can exceed
    * it, so the dropped evidence is from non-discriminating hub keys
    * only; audit drops via TextDedup.overCapBuckets). See
    * docs/SCALE.md "Joins" for the scale contract.
    */
  val uncapped: Int = Int.MaxValue
}
