package graft.tools

/** Rewrites the hand-drift-prone surface counts in README.md from the
  * single source of truth — `SparkEntry.queries` — instead of a human
  * remembering to bump them (they went stale twice across r9/r10).
  * Run at round close, after the full `sbt test`:
  *
  *   sbt "runMain graft.tools.CountsStamp <testCount>"
  *
  * where `<testCount>` is the "Tests: succeeded N" figure from that
  * sbt test summary (the only count not knowable from inside one JVM
  * — it exists only in sbt's own run report). Without the arg, only
  * the query-derived counts are stamped.
  *
  * Stamped patterns (anywhere in README.md):
  *   - `# <n> specs`              <- testCount arg
  *   - `(<n> declared queries`    <- SparkEntry.queries.size
  *   - `<n> oracle-checked`       <- SparkEntry.oracleSql.size
  * No Spark session needed — queries is a static map.
  */
object CountsStamp {

  def stamp(readme: String, queries: Int, oracles: Int,
      testCount: Option[Int]): String = {
    var s = readme
      .replaceAll("""\(\d+ declared queries""", s"($queries declared queries")
      .replaceAll("""\b\d+ oracle-checked""", s"$oracles oracle-checked")
    testCount.foreach { n =>
      s = s.replaceAll("""# \d+ specs""", s"# $n specs")
    }
    s
  }

  def main(args: Array[String]): Unit = {
    val queries = graft.SparkEntry.queries.size
    // static oracles + the run-time-authored ones (DynamicOracles is
    // empty in this fresh JVM — count its declared contract instead)
    val oracles = (graft.SparkEntry.oracleSql.keySet ++
      graft.queries.DynamicOracles.declared).size
    val testCount = args.headOption.map(_.toInt)
    val path = java.nio.file.Paths.get("README.md")
    val before = java.nio.file.Files.readString(path)
    val after = stamp(before, queries, oracles, testCount)
    java.nio.file.Files.writeString(path, after)
    println(s"stamped README.md: $queries declared queries, " +
      s"$oracles oracle-checked, specs=${testCount.getOrElse("(not given)")}" +
      (if (before == after) " [no change]" else ""))
  }
}
