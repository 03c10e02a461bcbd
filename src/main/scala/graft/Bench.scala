package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing: parquet footers, codegen
    // framework, shuffle machinery. Steady-state cost is what a
    // long-running cluster job sees; without this the first queries
    // absorb ~10 s of one-time JVM/Spark initialization.
    Tables.names.foreach { n =>
      try Tables.table(spark, sfDir, n).limit(1).count()
      catch { case _: Throwable => () }
    }
    try {
      import org.apache.spark.sql.functions._
      Tables.table(spark, sfDir, "lineitem")
        .groupBy("l_returnflag").agg(count(lit(1))).count()
    } catch { case _: Throwable => () }
    // two passes, keep the per-query minimum: local runs are noisy
    // (GC, codegen churn); min-of-2 is the steady-state figure.
    // noop sink (not count): count() lets Catalyst prune final sorts
    // and unreferenced projections, timing projection-heavy queries as
    // near-no-ops — the noop writer evaluates every output row fully.
    def pass(): Map[String, Double] = SparkEntry.queries.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        } catch { case e: Throwable =>
          // visibility only (timing semantics frozen): a broken query
          // must not silently read as a fast one
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop persisted subplans so caches neither accumulate nor
        // carry one query's work into another's timing
        spark.catalog.clearCache()
        name -> dt
    }
    val p1 = pass()
    val p2 = pass()
    val results = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    // 3-decimal seconds: full-precision doubles pushed the one-line
    // report past the driver's 2000-char capture window (r3 clipped the
    // first 9 queries). 79 queries at %.3f is ~1.7 KB — always fits.
    // Locale.ROOT: JVM-default-locale %.3f would print "0,169" under a
    // comma-decimal locale and break the JSON report
    def s3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
