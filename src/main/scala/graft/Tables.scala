package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (`TESTDATA.md`).
  * All reads go through here so filter pushdown / column pruning apply
  * uniformly and the `events` nanos quirk is handled in one place.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its TIMESTAMP(NANOS) column exposed as:
    *  - `ts_ns`  — raw epoch-nanos Long (full precision),
    *  - `ts`     — microsecond TimestampType (Spark-native),
    *  - `ts_sec` — second-truncated TimestampType (what oracle-compared
    *    queries use: DuckDB keeps nanos, Spark keeps micros, so any
    *    sub-second output would hash-mismatch by construction).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("ts_sec", timestamp_seconds(expr("ts_ns div 1000000000")))

  /** Per-run scratch path for queries that write real files (ORC
    * round-trip, CoW merge, persisted IVF, stream sink …). Fixed
    * names raced when two Verify/Bench runs shared a machine — two
    * processes would overwrite each other's layouts and checkpoints
    * mid-query — so the name carries the Spark application id:
    * stable within a run (the same query function can re-enter its
    * own directory), unique across concurrent runs.
    */
  def scratchDir(spark: SparkSession, name: String): java.nio.file.Path =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"${name}_${spark.sparkContext.applicationId}")
}
