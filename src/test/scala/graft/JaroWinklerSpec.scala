package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{JaroWinklerFunctions, JaroWinklerKernel}
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB's jaro_winkler_similarity bit-for-bit") {
    // golden values probed from DuckDB 1.0 (the oracle engine) —
    // the classic textbook pairs plus the cases that distinguish the
    // INTEGER transposition halving from the fractional t/2 variant
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jw("DwAyNE", "DuANE") == 0.8400000000000001)
    assert(jw("kitten", "sitting") == 0.746031746031746)
    assert(jw("Customer#000001", "Customer#000002") == 0.9733333333333334)
    // integer halving: odd differing-position counts (fractional
    // halving would give 0.4444 here, DuckDB gives 0.5)
    assert(jw("abadddbbb", "debeac") == 0.5)
    assert(jw("becea", "abacceaebb") == 0.7666666666666666)
    // boost threshold: jaro 0.6 with a 4-char prefix stays unboosted
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    assert(jw("abcdefxxxx", "abcdefyyyy") == 0.8400000000000001)
    // prefix capped at 4 even with 10 common chars
    assert(jw("aaaaaaaaaab", "aaaaaaaaaac") == 0.9636363636363636)
  }

  test("kernel edge cases: empty, equal, window-zero") {
    assert(jw("", "") == 0.0) // DuckDB convention, not the textbook 1.0
    assert(jw("", "abc") == 0.0)
    assert(jw("aaapppp", "") == 0.0)
    assert(jw("x", "x") == 1.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: only same-position matches
  }

  test("expression evaluates in a plan (codegen path) and handles nulls") {
    import spark.implicits._
    val df = Seq(
      ("MARTHA", "MARHTA"),
      ("CRATE", "TRACE"),
      (null, "x"),
      ("x", null)).toDF("a", "b")
    val got = df
      .withColumn("s", JaroWinklerFunctions.jaroWinkler(col("a"), col("b")))
      .select("s").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(0.9611111111111111))
    assert(got(1).contains(0.7333333333333334))
    assert(got(2).isEmpty && got(3).isEmpty)
  }

  test("symmetry on same-length inputs; result always in [0, 1]") {
    val samples = Seq("abcde", "aabbc", "edcba", "aaaaa", "bcdea")
    for (a <- samples; b <- samples) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      // equal lengths ⇒ the greedy match is symmetric
      assert(s == jw(b, a))
    }
  }
}
