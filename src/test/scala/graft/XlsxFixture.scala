package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Builds tiny in-repo xlsx byte fixtures (no external files): shared
  * strings (incl. rich-text runs), builtin + custom date numFmts, an
  * escaped-backslash non-date format, dense gaps, trailing empty rows,
  * ragged width.
  */
object XlsxFixture {

  val SheetXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<dimension ref="A1:D6"/>
      |<sheetData>
      |<row r="1">
      |  <c r="A1" t="s"><v>0</v></c>
      |  <c r="B1" t="s"><v>1</v></c>
      |  <c r="C1" t="s"><v>2</v></c>
      |</row>
      |<row r="2">
      |  <c r="A2" t="s"><v>3</v></c>
      |  <c r="B2"><v>3</v></c>
      |  <c r="C2" s="1"><v>45292</v></c>
      |</row>
      |<row r="3">
      |  <c r="A3" t="s"><v>4</v></c>
      |  <c r="C3" s="2"><v>60</v></c>
      |</row>
      |<row r="4">
      |  <c r="A4"><v>2.5</v></c>
      |  <c r="B4" s="3"><v>1.23</v></c>
      |  <c r="C4" s="4"><v>7</v></c>
      |</row>
      |<row r="5"/>
      |<row r="6"/>
      |</sheetData>
      |</worksheet>""".stripMargin

  val SharedStringsXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
      |<si><t>Name</t></si>
      |<si><t>Qty</t></si>
      |<si><t>When</t></si>
      |<si><r><t>Wid</t></r><r><t>get</t></r></si>
      |<si><t>Gadget</t></si>
      |</sst>""".stripMargin

  val StylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<numFmts count="3">
      |<numFmt numFmtId="164" formatCode="dd/mm/yyyy"/>
      |<numFmt numFmtId="165" formatCode="0.00"/>
      |<numFmt numFmtId="166" formatCode="0\m"/>
      |</numFmts>
      |<cellXfs count="5">
      |<xf numFmtId="0"/>
      |<xf numFmtId="14"/>
      |<xf numFmtId="164"/>
      |<xf numFmtId="165"/>
      |<xf numFmtId="166"/>
      |</cellXfs>
      |</styleSheet>""".stripMargin

  val WorkbookXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets>
      |<sheet name="Data" sheetId="1" r:id="rId1"/>
      |<sheet name="Second Sheet" sheetId="2" r:id="rId2"/>
      |</sheets>
      |</workbook>""".stripMargin

  val RelsXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
      |<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
      |</Relationships>""".stripMargin

  val Sheet2Xml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<dimension ref="A1:B2"/>
      |<sheetData>
      |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
      |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c></row>
      |</sheetData>
      |</worksheet>""".stripMargin

  /** One-sheet workbook around a caller-supplied worksheet XML — for
    * specs that pin parser edge behaviors (inline strings, implied
    * cell positions, crafted dimension boxes).
    */
  def createWith(sheetXml: String): Path = {
    val path = Files.createTempFile("graft-fixture1", ".xlsx")
    val zip = new ZipOutputStream(new FileOutputStream(path.toFile))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Only" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml", SharedStringsXml)
    put("xl/styles.xml", StylesXml)
    put("xl/worksheets/sheet1.xml", sheetXml)
    zip.close()
    path
  }

  /** Writes the two-sheet fixture workbook; returns its path. */
  def create(): Path = {
    val path = Files.createTempFile("graft-fixture", ".xlsx")
    val zip = new ZipOutputStream(new FileOutputStream(path.toFile))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("xl/workbook.xml", WorkbookXml)
    put("xl/_rels/workbook.xml.rels", RelsXml)
    put("xl/sharedStrings.xml", SharedStringsXml)
    put("xl/styles.xml", StylesXml)
    put("xl/worksheets/sheet1.xml", SheetXml)
    put("xl/worksheets/sheet2.xml", Sheet2Xml)
    zip.close()
    path
  }
}
