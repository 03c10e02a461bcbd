package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry, Tables}

/** Writes `explain("formatted")` for named declared queries to
  * per-query files — the optimization-round evidence artifact
  * (plans/r<N>/<query>_<tag>.txt). Unlike [[ExplainDump]] (one
  * markdown for the headline set), this snapshots exactly the queries
  * an optimization touches, before and after.
  *
  * Usage: runMain graft.tools.PlanSnap <outDir> <tag> <q1,q2,...>
  * (side-effecting queries run their builds — plans are of the final
  * returned frame, which is what the driver's oracle gate executes).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanSnap <outDir> <tag> <q1,q2,...>")
    val Array(outDir, tag, qlist) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    qlist.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      graft.ops.QueryCaches.releaseAll()
      spark.catalog.clearCache()
      println(s"[plansnap] wrote ${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
