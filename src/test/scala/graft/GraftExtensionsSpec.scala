package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs the as-of strategy at session build, " +
    "no register() call") {
    val base = TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new session over the same SparkContext. withExtensions is the
      // same injection hook the `spark.sql.extensions` config string
      // drives — the config form reads from the SparkContext's static
      // conf (spark-submit --conf), which a shared test context can't
      // carry, so the spec exercises the programmatic form.
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s2 ne base)
      // experimental strategies stay empty — planning must go through
      // the injected extension, not AsOfJoin.register()
      assert(s2.experimental.extraStrategies.isEmpty)
      import s2.implicits._
      val trades = Seq((1L, 10L, "t10"), (1L, 20L, "t20"), (2L, 15L, "t15"))
        .toDF("t_key", "t_time", "t_tag")
      val quotes = Seq((1L, 5L, "q5"), (1L, 18L, "q18"), (2L, 99L, "q99"))
        .toDF("q_key", "q_time", "q_tag")
      // build the logical node directly (AsOfJoin.join would register
      // the strategy programmatically, defeating the test)
      val node = AsOfJoin.AsOfJoinNode(
        Bridge.logicalPlan(trades), Bridge.logicalPlan(quotes),
        Bridge.expression(trades("t_key")), Bridge.expression(quotes("q_key")),
        Bridge.expression(trades("t_time")), Bridge.expression(quotes("q_time")),
        isLeftOuter = true)
      val out = Bridge.ofRows(s2, node)
        .select("t_key", "t_time", "q_time", "q_tag")
        .as[(Long, Long, Option[Long], Option[String])]
        .collect().toSet
      assert(out == Set(
        (1L, 10L, Some(5L), Some("q5")),
        (1L, 20L, Some(18L), Some("q18")),
        (2L, 15L, None, None)))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("GraftExtensions registers graft_dot for pure-SQL callers") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      val v = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0)
      assert(v == 11.0)
      // same kernel as the DataFrame API: over a non-literal input the
      // plan carries the native expression (literal args would be
      // constant-folded at optimization time — itself proof the
      // expression is a real foldable Catalyst node)
      import s2.implicits._
      val plan = Seq(Array(1.0, 2.0)).toDF("v").createOrReplaceTempView("vv")
      val p = s2.sql("SELECT graft_dot(v, v) FROM vv").queryExecution
        .executedPlan.toString
      assert(p.toLowerCase.contains("dotproduct"), p)
      val err = intercept[Exception] { s2.sql("SELECT graft_dot(array(1.0d))") }
      assert(err.getMessage.contains("two arguments"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
