package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.SheetMatrix

/** CSV ingestion with delimiter sniffing, porting `xsv_to_array2d`
  * (`app/data.py:30-45`): sniff on a ≤10-line sample, then parse the
  * whole input with the winning delimiter; input is pre-stripped of
  * leading/trailing blank lines.
  *
  * Two paths:
  *  - [[read]] — file(s) on any Spark-visible filesystem: the sample is
  *    taken with a bounded `limit(10)` scan, then the full read is a
  *    normal distributed `spark.read.csv` (splittable, pushdown-able;
  *    this is the 100 TB path);
  *  - [[fromString]] — an in-memory payload (the reference's HTTP body
  *    case, `home.py:25-26`): parsed driver-side into the sheet matrix.
  */
object CsvIngest {

  def sniffFile(spark: SparkSession, path: String): Char = {
    val sample = spark.read.textFile(path).limit(10).collect().mkString("\n")
    Sniffer.sniffDelimiter(sample)
  }

  def read(spark: SparkSession, path: String, header: Boolean = true): DataFrame = {
    val d = sniffFile(spark, path)
    spark.read
      .option("sep", d.toString)
      .option("header", header.toString)
      // no inferSchema: all columns stay StringType, like the reference
      .csv(path)
  }

  def fromString(spark: SparkSession, payload: String,
      headerFromFirstRow: Boolean = true): DataFrame = {
    val stripped = payload.dropWhile(_ == '\n')
      .reverse.dropWhile(_ == '\n').reverse
    val d = Sniffer.sniffDelimiter(
      stripped.linesWithSeparators.take(10).mkString)
    val matrix = Sniffer.parse(stripped, d)
    SheetMatrix.toDataFrame(spark, matrix, headerFromFirstRow)
  }
}
