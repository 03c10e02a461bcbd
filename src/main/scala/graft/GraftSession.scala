package graft

import org.apache.spark.sql.SparkSession

/** One place for the session settings every entry point (Verify, Bench,
  * tests) shares, so oracle parity and scale knobs stay consistent:
  *
  *  - UTC session time zone (DuckDB-oracle parity for date math);
  *  - `nanosAsLong`: the driver's `events` table carries
  *    TIMESTAMP(NANOS) which Spark's parquet reader rejects by default;
  *    with the flag it arrives as a Long of epoch-nanos and
  *    [[Tables.events]] converts explicitly;
  *  - AQE on (runtime shuffle coalescing + skew-join splitting — the
  *    behavior we want on a real cluster, exercised locally too).
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.ui.enabled", "false")

  /** Local session for tests/tools. `cpus` threads, shuffle partitions
    * sized to match (not the 200 default, which just fragments local
    * runs; on a real cluster this is set per-job to ~2-3× total cores).
    */
  def local(cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
