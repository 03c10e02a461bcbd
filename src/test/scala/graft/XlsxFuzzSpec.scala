package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.ExcelDate
import graft.ingest.XlsxIngest

/** Property-fuzz of the xlsx parser (reference contract:
  * `xlsparser.js:121-187`): random sparse sheets — shared / invalid
  * shared / inline / numeric / date-styled / empty cells, optional
  * `r=` attributes on rows AND cells (positions implied from the
  * cursor), and honest / lying-small / lying-huge / absent
  * `<dimension>` boxes — must parse to exactly the dense matrix built
  * by construction from the generated cell map (dense '' fill to the
  * observed extent, trailing-empty-row trim, ragged slice to the max
  * used column). The hand-written specs in [[XlsxIngestSpec]] pin the
  * named behaviors; this generator sweeps their interactions.
  */
class XlsxFuzzSpec extends AnyFunSuite with PropHelpers {

  private val Pool = Vector("alpha", "bravo charlie", "delta4", "x", "")

  // kind: 0 shared(valid) | 1 shared(out-of-range) | 2 inlineStr
  //       3 numeric (non-date style) | 4 date-styled serial | 5 empty <c/>
  private final case class PCell(kind: Int, num: Int, text: String)
  private final case class PSheet(
      nRows: Int, nCols: Int,
      cells: Map[(Int, Int), PCell],
      dimVariant: Int, seed: Long)

  private val cellGen: Gen[PCell] = for {
    kind <- Gen.choose(0, 5)
    num <- Gen.choose(1, 59999)
    text <- Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString)
  } yield PCell(kind, num, text)

  private val sheetGen: Gen[PSheet] = for {
    nRows <- Gen.choose(1, 9)
    nCols <- Gen.choose(1, 6)
    picks <- Gen.listOfN(nRows * nCols, Gen.frequency(
      1 -> cellGen.map(Option(_)),
      1 -> Gen.const(Option.empty[PCell])))
    dim <- Gen.choose(0, 3)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield {
    val coords = for { r <- 1 to nRows; c <- 1 to nCols } yield (r, c)
    PSheet(nRows, nCols,
      coords.zip(picks).collect { case (rc, Some(p)) => rc -> p }.toMap,
      dim, seed)
  }

  private def expectedVal(p: PCell): String = p.kind match {
    case 0 => Pool(p.num % Pool.length)
    case 1 => "" // out-of-range shared index resolves to ''
    case 2 => p.text
    case 3 => p.num.toString
    case 4 => ExcelDate.toDate(p.num, leapBugCompat = true).toString
    case 5 => ""
  }

  /** The reference trim, re-derived independently: dense fill to the
    * committed-cell extent, pop trailing all-empty rows, slice every
    * row to the max non-empty column.
    */
  private def expectedMatrix(s: PSheet): Vector[Vector[String]] = {
    val vals = s.cells.map { case (rc, p) => rc -> expectedVal(p) }
    val maxR = s.cells.keys.map(_._1).maxOption.getOrElse(0)
    val maxC = s.cells.keys.map(_._2).maxOption.getOrElse(0)
    if (maxR == 0 || maxC == 0) return Vector.empty
    val dense = Vector.tabulate(maxR, maxC)(
      (r, c) => vals.getOrElse((r + 1, c + 1), ""))
    val lastNonEmpty = dense.lastIndexWhere(_.exists(_ != ""))
    if (lastNonEmpty < 0) return Vector.empty
    val kept = dense.take(lastNonEmpty + 1)
    val width = kept.iterator.map(_.lastIndexWhere(_ != "") + 1).max
    kept.map(_.take(width))
  }

  private def colName(c: Int): String = {
    var n = c
    val sb = new StringBuilder
    while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cellXml(rnd: java.util.Random, r: Int, c: Int,
      prevCol: Int, p: PCell): String = {
    // omit r= only where the implied cursor (previous col + 1) lands
    // on the right cell — a coin decides so both paths are swept
    val ref =
      if (c == prevCol + 1 && rnd.nextBoolean()) ""
      else s""" r="${colName(c)}$r""""
    p.kind match {
      case 0 => s"""<c$ref t="s"><v>${p.num % Pool.length}</v></c>"""
      case 1 => s"""<c$ref t="s"><v>${Pool.length + p.num % 7}</v></c>"""
      case 2 => s"""<c$ref t="inlineStr"><is><t>${p.text}</t></is></c>"""
      case 3 => s"""<c$ref s="0"><v>${p.num}</v></c>"""
      case 4 => s"""<c$ref s="1"><v>${p.num}</v></c>"""
      case 5 => s"""<c$ref/>"""
    }
  }

  private def sheetXml(s: PSheet): String = {
    val rnd = new java.util.Random(s.seed)
    val dim = s.dimVariant match {
      case 0 => "" // absent
      case 1 => s"""<dimension ref="A1:${colName(s.nCols)}${s.nRows}"/>"""
      case 2 => """<dimension ref="A1:A1"/>"""             // lying small
      case 3 => """<dimension ref="A1:XFD1048576"/>"""     // lying huge
    }
    val byRow = s.cells.groupBy(_._1._1).toSeq.sortBy(_._1)
    var prevRow = 0
    val rows = byRow.map { case (r, rowCells) =>
      // omit the row's r= only when it is the implied next row
      val rAttr =
        if (r == prevRow + 1 && rnd.nextBoolean()) "" else s""" r="$r""""
      prevRow = r
      var prevCol = 0
      val cs = rowCells.toSeq.sortBy(_._1._2).map { case ((_, c), p) =>
        val x = cellXml(rnd, r, c, prevCol, p)
        prevCol = c
        x
      }.mkString
      s"<row$rAttr>$cs</row>"
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |$dim
       |<sheetData>
       |$rows
       |</sheetData>
       |</worksheet>""".stripMargin
  }

  private val SharedXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |""".stripMargin +
      Pool.map(t => s"<si><t>$t</t></si>").mkString("\n") + "\n</sst>"

  private val StylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>
      |</styleSheet>""".stripMargin

  private def writeWorkbook(s: PSheet): Path = {
    val path = Files.createTempFile("graft-fuzz", ".xlsx")
    val zip = new ZipOutputStream(new FileOutputStream(path.toFile))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Fuzz" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml", SharedXml)
    put("xl/styles.xml", StylesXml)
    put("xl/worksheets/sheet1.xml", sheetXml(s))
    zip.close()
    path
  }

  test("property: random sparse workbooks parse to the matrix built by construction") {
    forAll(sheetGen, n = 80) { s =>
      val path = writeWorkbook(s)
      try {
        val parsed = XlsxIngest.parseMatrices(path.toString).toMap
        val got = parsed.getOrElse("Fuzz", Vector.empty)
        val want = expectedMatrix(s)
        assert(got == want,
          s"\nsheet=$s\nxml=\n${sheetXml(s)}\ngot=$got\nwant=$want")
      } finally Files.deleteIfExists(path)
    }
  }
}
