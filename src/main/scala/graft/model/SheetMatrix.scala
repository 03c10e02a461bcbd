package graft.model

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's universal IR: a row-oriented 2-D matrix of strings,
  * first row = header (`app/data.py:30` et al.; dense, `''`-filled —
  * `xlsparser.js:136-142`). Spark-side it becomes a DataFrame with an
  * all-StringType schema (§1.4 of SURVEY.md).
  *
  * Only the intentionally-small xlsx/payload path materializes a matrix
  * on the driver; bulk data enters through `spark.read` (CsvIngest).
  */
object SheetMatrix {

  /** Column names for a header row: sanitized with `to_alnum` and made
    * unique/non-empty (the reference would emit duplicate or empty
    * column names straight into DDL and fail at the warehouse; we fix
    * that deterministically: empty → `_cN`, duplicate → `name_N`).
    */
  def headerNames(header: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    header.zipWithIndex.map { case (raw, i) =>
      val base0 = Identifiers.toAlnum(raw)
      val base = if (base0.isEmpty) s"_c$i" else base0
      val n = seen.getOrElse(base.toLowerCase, 0)
      seen(base.toLowerCase) = n + 1
      if (n == 0) base else s"${base}_$n"
    }
  }

  /** Matrix → all-string DataFrame. Rows are padded to the widest row
    * with `""` (dense-fill semantics). With `headerFromFirstRow`, row 0
    * becomes the (sanitized, uniquified) column names.
    */
  def toDataFrame(
      spark: SparkSession,
      matrix: Seq[Seq[String]],
      headerFromFirstRow: Boolean = true): DataFrame = {
    require(matrix.nonEmpty, "empty matrix")
    val width = matrix.map(_.length).max
    def pad(r: Seq[String]): Seq[String] =
      if (r.length == width) r else r ++ Seq.fill(width - r.length)("")
    val (names, body) =
      if (headerFromFirstRow) (headerNames(pad(matrix.head)), matrix.tail)
      else ((0 until width).map(i => s"_c$i"), matrix)
    val schema = StructType(names.map(n => StructField(n, StringType)))
    val rows = body.map(r => Row.fromSeq(pad(r)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)
  }
}
