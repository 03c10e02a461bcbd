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

  def forAllStrings(f: String => Unit): Unit =
    forAll(Arbitrary.arbitrary[String])(f)

  def forAllStringLists(f: List[String] => Unit): Unit =
    forAll(Arbitrary.arbitrary[List[String]])(f)
}
