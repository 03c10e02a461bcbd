package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{XlsxIngest, XlsxWriter}
import graft.ingest.XlsxWriter._

/** Round-trip: XlsxWriter output must parse back through XlsxIngest
  * with every semantic the writer claims to exercise — shared-string
  * dedup, builtin + custom date styles, custom non-date passthrough,
  * dense gap fill, trailing-empty trim.
  */
class XlsxWriterSpec extends AnyFunSuite {

  test("colName is bijective base-26") {
    assert(XlsxWriter.colName(1) == "A")
    assert(XlsxWriter.colName(26) == "Z")
    assert(XlsxWriter.colName(27) == "AA")
    assert(XlsxWriter.colName(52) == "AZ")
    assert(XlsxWriter.colName(703) == "AAA")
    // inverse of the reader's decoder for the whole practical range
    (1 to 2000).foreach { n =>
      val (row, c) = graft.expr.A1Ref.parse(s"${XlsxWriter.colName(n)}1")
      assert(row == 1 && c == n, s"colName($n) failed round-trip")
    }
  }

  test("writer output round-trips through XlsxIngest") {
    val path = Files.createTempFile("graft-writer", ".xlsx")
    val rows: Seq[Seq[Cell]] = Seq(
      Seq(Str("id"), Str("label"), Str("d_builtin"), Str("d_custom"), Str("styled")),
      Seq(Num("1"), Str("alpha"), DateSerial(59), DateSerial(60, builtin = false), StyledNum("1.25")),
      Seq(Num("2"), Str("alpha"), DateSerial(61), Blank, StyledNum("7")),
      Seq(Num("3"), Str("be<ta>&"), Blank, DateSerial(45292, builtin = false), Blank))
    XlsxWriter.write(path, "RT", rows, trailingEmptyRows = 4)

    val parsed = XlsxIngest.parseMatrices(path.toString)
    assert(parsed.map(_._1) == Seq("RT"))
    val m = parsed.head._2
    // trailing empties trimmed: header + 3 data rows only
    assert(m.length == 4)
    assert(m.head == Vector("id", "label", "d_builtin", "d_custom", "styled"))
    // compat mode (the default) is 1899-12-31 + serial on the REAL
    // calendar: serial 60 (Excel's fictitious 1900-02-29) lands on
    // 1900-03-01, one day ahead of what Excel displays
    assert(m(1) == Vector("1", "alpha", "1900-02-28", "1900-03-01", "1.25"))
    assert(m(2) == Vector("2", "alpha", "1900-03-02", "", "7"))
    // gap cells dense-filled; XML-special chars escaped and restored
    assert(m(3) == Vector("3", "be<ta>&", "", "2024-01-02", ""))
  }

  test("shared strings are pool-deduplicated") {
    val path = Files.createTempFile("graft-writer-sst", ".xlsx")
    val rows: Seq[Seq[Cell]] = Seq(
      Seq(Str("a"), Str("b")),
      Seq(Str("x"), Str("x")),
      Seq(Str("x"), Str("y")))
    XlsxWriter.write(path, "S", rows)
    val zip = new java.util.zip.ZipFile(path.toFile)
    try {
      val in = zip.getInputStream(zip.getEntry("xl/sharedStrings.xml"))
      val sst = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      assert(sst.contains("""uniqueCount="4""""))
      assert("<si>".r.findAllIn(sst).length == 4)
    } finally zip.close()
  }
}
