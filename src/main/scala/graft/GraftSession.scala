package graft

import org.apache.spark.sql.SparkSession

/** One place for the session settings every entry point (Verify, Bench,
  * tests) shares, so oracle parity and scale knobs stay consistent:
  *
  *  - UTC session time zone (DuckDB-oracle parity for date math);
  *  - `nanosAsLong`: an `events` table carrying TIMESTAMP(NANOS)
  *    (early testdata generations) is rejected by Spark's parquet
  *    reader by default; with the flag it arrives as a Long of
  *    epoch-nanos and [[Tables.withEventTime]] converts explicitly;
  *  - NTZ inference OFF: regenerated testdata stores `events.ts` as
  *    timestamp[us] with isAdjustedToUTC=false, which Spark would
  *    otherwise surface as TIMESTAMP_NTZ — breaking every
  *    TimestampType consumer (encoders, watermarks) and diverging
  *    from DuckDB's naive-read-as-UTC. With inference off it reads as
  *    plain TimestampType; under the UTC session zone the stored
  *    micros are taken as-is, matching the oracle's `epoch_ns(ts)`;
  *  - AQE on (runtime shuffle coalescing + skew-join splitting — the
  *    behavior we want on a real cluster, exercised locally too).
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // size post-shuffle partitions by BYTES (advisoryPartitionSize),
    // not by the session's parallelism: with the default
    // parallelismFirst=true AQE keeps tiny shuffles at full width and
    // every stage over a small frame pays (width × per-task fixed
    // cost) for kilobytes of data — measured 219 s of task CPU across
    // 78 stages on a 600 KB corpus (q_cosine_incr_idx, sf0.1). Bytes-
    // based sizing is scale-ADAPTIVE: big inputs still get wide
    // stages, small ones collapse; Spark's own docs recommend
    // disabling parallelismFirst in production. Explicit repartitions
    // (globalRowNumber's range shape) are never AQE-coalesced, so
    // partition-id-dependent logic is unaffected.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "false")
    // let PERSISTED plans apply AQE too (off by default): the ops
    // persist their shared frames, and with this off every cache
    // materializes at the raw shuffle width and every one of its many
    // scans pays that width in tasks — the per-task fixed cost above,
    // multiplied by each cache's consumer count
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      "true")
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
