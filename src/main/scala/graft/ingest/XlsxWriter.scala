package graft.ingest

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Path
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.collection.mutable

/** Minimal deterministic XLSX writer — the inverse of [[XlsxIngest]],
  * emitting exactly the five zip members the reference's parser reads
  * (`app/static/xlsparser.js:20-34`): workbook, rels, sharedStrings,
  * styles, worksheet. Used to synthesize round-trip fixtures from real
  * table rows (q_xlsx) and by library users who need a small
  * spreadsheet export of a driver-sized result.
  *
  * Deliberately small-scale: an xlsx is a single non-splittable zip,
  * so this writes a driver-side matrix, never a distributed Dataset —
  * bulk output belongs to parquet/CSV sinks.
  */
object XlsxWriter {

  sealed trait Cell
  /** Shared-string cell (`t="s"`, pool-deduplicated). */
  final case class Str(value: String) extends Cell
  /** Plain numeric cell — raw text passes through the parser as-is. */
  final case class Num(raw: String) extends Cell
  /** Date-styled serial: builtin numFmt 14 or a custom m/d/y format,
    * so both branches of the style table (`xlsparser.js:52-82`) are
    * exercised by round-trip fixtures.
    */
  final case class DateSerial(serial: Int, builtin: Boolean = true) extends Cell
  /** Numeric with a custom NON-date numFmt ("0.00") — must pass through
    * the parser untouched (style-table negative case).
    */
  final case class StyledNum(raw: String) extends Cell
  /** Omitted cell — the parser's dense fill must restore it as `""`. */
  case object Blank extends Cell

  // cellXfs ordinals written below: 0 general, 1 builtin date (14),
  // 2 custom date (164 "dd/mm/yyyy"), 3 custom non-date (165 "0.00")
  private val StylesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<numFmts count="2">
      |<numFmt numFmtId="164" formatCode="dd/mm/yyyy"/>
      |<numFmt numFmtId="165" formatCode="0.00"/>
      |</numFmts>
      |<cellXfs count="4">
      |<xf numFmtId="0"/>
      |<xf numFmtId="14"/>
      |<xf numFmtId="164"/>
      |<xf numFmtId="165"/>
      |</cellXfs>
      |</styleSheet>""".stripMargin

  /** 1-based column number → bijective base-26 letters (1→A, 27→AA). */
  def colName(n: Int): String = {
    require(n >= 1, s"column number must be >= 1, got $n")
    val sb = new StringBuilder
    var x = n
    while (x > 0) {
      val r = (x - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      x = (x - 1) / 26
    }
    sb.result()
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** Write `rows` (row 0 = header) as a one-sheet workbook at `path`,
    * plus `trailingEmptyRows` empty `<row/>` elements inside the
    * declared dimension (the parser's trim must drop them). Overwrites.
    */
  def write(
      path: Path,
      sheetName: String,
      rows: Seq[Seq[Cell]],
      trailingEmptyRows: Int = 0): Path = {
    require(rows.nonEmpty, "workbook needs at least a header row")
    val width = rows.map(_.length).max
    val totalRows = rows.length + trailingEmptyRows

    // shared-string pool in order of first appearance
    val pool = mutable.LinkedHashMap.empty[String, Int]
    rows.flatten.foreach {
      case Str(v) => pool.getOrElseUpdate(v, pool.size)
      case _ =>
    }

    val sheet = new StringBuilder
    sheet ++= "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n"
    sheet ++= "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">\n"
    sheet ++= s"""<dimension ref="A1:${colName(width)}$totalRows"/>\n<sheetData>\n"""
    rows.zipWithIndex.foreach { case (row, i) =>
      val r = i + 1
      sheet ++= s"""<row r="$r">"""
      row.zipWithIndex.foreach { case (cell, j) =>
        val ref = s"${colName(j + 1)}$r"
        cell match {
          case Str(v) =>
            sheet ++= s"""<c r="$ref" t="s"><v>${pool(v)}</v></c>"""
          case Num(raw) =>
            sheet ++= s"""<c r="$ref"><v>${xmlEscape(raw)}</v></c>"""
          case DateSerial(serial, builtin) =>
            val s = if (builtin) 1 else 2
            sheet ++= s"""<c r="$ref" s="$s"><v>$serial</v></c>"""
          case StyledNum(raw) =>
            sheet ++= s"""<c r="$ref" s="3"><v>${xmlEscape(raw)}</v></c>"""
          case Blank => // omitted: the reader's dense fill restores ""
        }
      }
      sheet ++= "</row>\n"
    }
    (rows.length until totalRows).foreach { i =>
      sheet ++= s"""<row r="${i + 1}"/>\n"""
    }
    sheet ++= "</sheetData>\n</worksheet>"

    val sst = new StringBuilder
    sst ++= "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n"
    sst ++= s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${pool.size}" uniqueCount="${pool.size}">\n"""
    pool.keys.foreach(v => sst ++= s"<si><t>${xmlEscape(v)}</t></si>\n")
    sst ++= "</sst>"

    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${xmlEscape(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin

    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
        |</Relationships>""".stripMargin

    val zip = new ZipOutputStream(new FileOutputStream(path.toFile))
    try {
      def put(name: String, content: String): Unit = {
        zip.putNextEntry(new ZipEntry(name))
        zip.write(content.getBytes(StandardCharsets.UTF_8))
        zip.closeEntry()
      }
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", rels)
      put("xl/sharedStrings.xml", sst.result())
      put("xl/styles.xml", StylesXml)
      put("xl/worksheets/sheet1.xml", sheet.result())
    } finally zip.close()
    path
  }
}
