package graft.sync

import org.apache.spark.sql.SparkSession

import graft.ingest.{CsvIngest, XlsxIngest}
import graft.model.Identifiers

/** The reference's `POST /upload` dataflow (`app/controllers/home.py:
  * 21-47`) as a library entry point: parse every sheet, `sqlify` the
  * sheet name into a table name, route to a destination, collect
  * human-readable reports. Reference bugs B1-B5 do not exist here:
  * table naming happens before any rebinding, counts exclude the
  * header, and empty sheets still report a defined action.
  */
object UploadPipeline {

  /** Workbook upload → local destination. One report line per sheet. */
  def uploadXlsx(
      spark: SparkSession,
      xlsxPath: String,
      baseDir: String,
      path: String = "",
      opts: XlsxIngest.Options = XlsxIngest.Options()): Seq[String] =
    XlsxIngest.readWorkbook(spark, xlsxPath, opts).map {
      case (sheetName, df) =>
        LocalDestination
          .write(df, Identifiers.sqlify(sheetName), path, baseDir)
          .render
    }.toSeq

  /** CSV upload (sniffed delimiter); table named from the file stem. */
  def uploadCsv(
      spark: SparkSession,
      csvPath: String,
      baseDir: String,
      path: String = ""): String = {
    val stem = {
      val f = new java.io.File(csvPath).getName
      val dot = f.lastIndexOf('.')
      if (dot > 0) f.substring(0, dot) else f
    }
    val df = CsvIngest.read(spark, csvPath)
    LocalDestination.write(df, Identifiers.sqlify(stem), path, baseDir)
      .render
  }

  /** CLI: `UploadPipeline <file.xlsx|file.csv> <outDir> [subPath]` */
  def main(args: Array[String]): Unit = {
    val Array(file, outDir, rest @ _*) = args: @unchecked
    val sub = rest.headOption.getOrElse("")
    val spark = graft.GraftSession.local()
    val reports =
      // case-insensitive: browsers/OSes upper-case extensions
      // (Report.XLSX routed through the CSV sniffer parsed zip bytes)
      if (file.toLowerCase.endsWith(".xlsx")) uploadXlsx(spark, file, outDir, sub)
      else Seq(uploadCsv(spark, file, outDir, sub))
    reports.foreach(print)
    spark.stop()
  }
}
