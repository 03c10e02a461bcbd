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
    val taken = scala.collection.mutable.HashSet.empty[String]
    header.zipWithIndex.map { case (raw, i) =>
      val base0 = Identifiers.toAlnum(raw)
      val base = if (base0.isEmpty) s"_c$i" else base0
      val key = base.toLowerCase
      // collision-PROOF, not just per-base counting: a generated
      // suffix can collide with a later literal column ("a","a","a_1"
      // counted to a, a_1, a_1 — duplicate DDL, failed CREATE), so
      // probe the taken set until the name is genuinely free
      var n = seen.getOrElse(key, 0)
      var name = if (n == 0) base else s"${base}_$n"
      while (taken.contains(name.toLowerCase)) {
        n += 1
        name = s"${base}_$n"
      }
      seen(key) = n + 1
      taken += name.toLowerCase
      name
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
