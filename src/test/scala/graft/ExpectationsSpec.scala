package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Expectations

class ExpectationsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def getN(df: org.apache.spark.sql.DataFrame): Long =
    df.head().getAs[Long]("n_violations")

  test("notNull counts rows with any null key; inRange is inclusive") {
    val df = Seq(
      (Some(1L), Some("a")), (None, Some("b")),
      (Some(3L), None), (None, None))
      .toDF("k", "v")
    assert(getN(Expectations.notNull(df, "nn", Seq("k", "v"))) == 3L)
    val r = Seq(Some(0.9), Some(1.0), Some(50.0), Some(50.1), None)
      .toDF("x")
    // 0.9 and 50.1 violate; bounds themselves pass; null is not a
    // range violation (that's notNull's job)
    assert(getN(Expectations.inRange(r, "rg", "x",
      lit(1.0), lit(50.0))) == 2L)
  }

  test("unique counts duplicates beyond the first, nulls included") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    // three 1s -> 2 extras; two nulls -> 1 extra
    assert(getN(Expectations.unique(df, "u", Seq("k"))) == 3L)
  }

  test("foreignKey: missing parents counted, null child keys skipped") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    assert(getN(Expectations.foreignKey(
      child, "fk", Seq("ck"), parent, Seq("pk"))) == 1L)
  }

  test("satisfies counts predicate failures; null predicates fail") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Some(1L), Some(5L), None).toDF("k")
    // 1 passes, 5 fails the predicate, null k → null predicate → fails
    assert(getN(Expectations.satisfies(df, "s", col("k") < 3L)) == 2L)
  }

  test("report unions checks with pass flags in name order") {
    val a = Seq(1L).toDF("k")
    val rep = Expectations.report(Seq(
      Expectations.unique(a, "b_check", Seq("k")),
      Expectations.notNull(a, "a_check", Seq("k"))))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(rep == Seq(("a_check", 0L, true), ("b_check", 0L, true)))
    intercept[IllegalArgumentException](Expectations.report(Nil))
  }
}
