package graft.tools

import org.apache.spark.sql.execution.window.WindowExec

/** Sweeps every declared query's physical plan for UNPARTITIONED
  * window operators (`WindowExec` with an empty partition spec — the
  * single-reducer funnel that silently serializes at scale) and
  * prints the offenders. The known-benign set is whitelisted in
  * `PlanSpec` ("unpartitioned windows appear only in the whitelisted
  * queries"); this main is the discovery/triage half of that pin.
  *
  *   sbt "runMain graft.tools.WindowAudit [sfDir]"
  *
  * AQE is disabled for the sweep: executed plans under AQE hide
  * stage subtrees behind leaf QueryStageExec nodes (CLAUDE.md), and
  * a plan-only inspection needs no runtime re-planning anyway.
  */
object WindowAudit {

  /** Queries allowed to plan a global window, each bounded by
    * construction (see PlanSpec's whitelist test for the rationale).
    */
  val whitelist: Set[String] = Set(
    // reference-faithful global row_number (driver-sized; each has a
    // PlanSpec-pinned scale-safe `_scaled` twin via globalRowNumber)
    "q_batch", "q_reshape",
    // calendar-bounded hourly frames (corpus collapses to <= 8.8k
    // rows/year BEFORE the window)
    "q_seasonal_decomp", "q_anomaly_hours", "q_changepoint",
    "q_acf", "q_holt_winters", "q_hourly_gaps",
    // k-row frames (after .limit(k) / bounded seed selection)
    "q_ann_ivf_kmeans", "q_stream_ivf",
    // bounded post-aggregate frames (quantile grid, distribution keys)
    "q_equi_depth_hist", "q_quantiles")

  def unpartitionedWindows(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.size

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()).getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    var offenders = Vector.empty[(String, Int)]
    names.foreach { name =>
      val t0 = System.nanoTime()
      val r = try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        Right(unpartitionedWindows(df.queryExecution.executedPlan))
      } catch { case e: Throwable => Left(e.getClass.getSimpleName) }
      graft.ops.QueryCaches.releaseAll()
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      r match {
        case Right(n) if n > 0 =>
          offenders :+= (name, n)
          println(f"$name%-28s $n global window(s)  [${dt}%.1f s]")
        case Right(_) => ()
        case Left(err) => println(f"$name%-28s PLAN FAILED: $err")
      }
    }
    val newOnes = offenders.map(_._1).filterNot(whitelist)
    val unused = whitelist -- offenders.map(_._1).toSet
    println(s"\n${offenders.size} queries with global windows; " +
      s"NEW (not whitelisted): ${if (newOnes.isEmpty) "none" else newOnes.mkString(", ")}; " +
      s"whitelisted-but-clean: ${if (unused.isEmpty) "none" else unused.mkString(", ")}")
  }
}
