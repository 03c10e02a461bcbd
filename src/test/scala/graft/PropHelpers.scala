package graft

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed

/** Minimal deterministic property runner over raw ScalaCheck `Gen`
  * (the scalatestplus bridge isn't in the offline dependency cache).
  */
trait PropHelpers {

  def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  /** Slice `items` at sorted cut positions into non-empty batches —
    * the shared micro-batch scaffolding of the stream fuzz specs.
    */
  def sliceBatches[A](items: Vector[A], cuts: Vector[Int]): Vector[Vector[A]] = {
    val bounds = (0 +: cuts :+ items.length).distinct.sorted
    bounds.sliding(2).map(w => items.slice(w(0), w(1))).toVector
      .filter(_.nonEmpty)
  }

  /** Inject at-least-once redeliveries into sliced batches: item `i`
    * is re-sent inside batch `rb` (clamped to the last batch), never
    * BEFORE its original delivery (a redelivery is a duplicate, not a
    * reordering); `eligible(i, batchIdx)` lets a spec veto further
    * (e.g. only redeliver while still inside the operator's horizon).
    * One shared implementation so a fix to the eligibility rule can't
    * drift apart across the fuzz specs.
    */
  def withRedeliveries[A](
      batches: Vector[Vector[A]],
      redeliveries: Vector[(Int, Int)],
      isOriginal: (A, Int) => Boolean,
      original: Int => A,
      eligible: (Int, Int) => Boolean = (_, _) => true): Vector[Vector[A]] =
    batches.zipWithIndex.map { case (b, bi) =>
      def origBatchOf(i: Int): Int =
        batches.indexWhere(_.exists(isOriginal(_, i)))
      b ++ redeliveries.collect {
        case (i, rb) if math.min(rb, batches.length - 1) == bi &&
          origBatchOf(i) >= 0 && origBatchOf(i) <= bi &&
          eligible(i, bi) => original(i)
      }
    }

  def forAllStrings(f: String => Unit): Unit =
    forAll(Arbitrary.arbitrary[String])(f)

  def forAllStringLists(f: List[String] => Unit): Unit =
    forAll(Arbitrary.arbitrary[List[String]])(f)
}
