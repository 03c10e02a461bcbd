package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def frames = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_sec"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts_sec").as("signup_ts"))
    (purchases, signups)
  }

  test("custom AsOfJoinExec matches the declared window-based q_asof_join") {
    val (purchases, signups) = frames
    val viaExec = AsOfJoin.join(purchases, signups,
      purchases("user_id"), signups("s_user"),
      purchases("ts_sec"), signups("signup_ts"))
      .select(col("event_id"), col("user_id"),
        col("ts_sec").as("purchase_ts"), col("signup_ts").as("last_signup_ts"))
      .orderBy("event_id")
    val viaWindow = SparkEntry.queries("q_asof_join")(spark, dir)
    val a = viaExec.collect().toSeq
    val b = viaWindow.collect().toSeq
    assert(a == b)
  }

  test("left_outer keeps unmatched purchases with null signup") {
    val (purchases, signups) = frames
    val outer = AsOfJoin.join(purchases, signups,
      purchases("user_id"), signups("s_user"),
      purchases("ts_sec"), signups("signup_ts"), "left_outer")
    assert(outer.count() == purchases.count())
    val unmatched = outer.filter(col("signup_ts").isNull).count()
    val inner = AsOfJoin.join(purchases, signups,
      purchases("user_id"), signups("s_user"),
      purchases("ts_sec"), signups("signup_ts")).count()
    assert(unmatched == purchases.count() - inner)
  }

  test("plans as AsOfJoinExec with hash exchanges + sorts, no window") {
    val (purchases, signups) = frames
    val p = AsOfJoin.join(purchases, signups,
      purchases("user_id"), signups("s_user"),
      purchases("ts_sec"), signups("signup_ts"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // nodeName strips the Exec suffix
    assert(!p.contains("Window"), s"should not fall back to window:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
  }

  test("equal timestamps match (<= semantics, like ASOF JOIN)") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L)).toDF("id", "k", "t")
    val r = Seq((100L, 10L, "same-ts"), (100L, 5L, "earlier"))
      .toDF("rk", "rt", "tag")
    val j = AsOfJoin.join(l, r, l("k"), r("rk"), l("t"), r("rt"))
    val row = j.collect().head
    assert(row.getAs[String]("tag") == "same-ts")
  }
}
