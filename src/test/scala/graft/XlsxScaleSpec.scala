package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{XlsxIngest, XlsxWriter}
import graft.ingest.XlsxWriter.{Num, Str}

/** Large-workbook ingestion stress: a single giant sheet is
  * inherently ONE task (an xlsx is a zip of XML — not splittable),
  * so the one-sheet bound the engine must honor is the DRIVER-side
  * streaming parse staying O(used cells) and fast enough that the
  * per-workbook parallelism of `sources/XlsxDataSource` (many
  * workbooks × one task each) is the only scale dimension needed.
  * This spec pins that bound with a measured figure: 100k rows × 6
  * cols through the real writer → StAX parse → matrix, asserting
  * content fidelity at the corners and a conservative throughput
  * floor (the observed local rate is far above it; the floor only
  * catches an accidental O(n²) — e.g. a quadratic matrix append or
  * shared-string rescan — not machine variance).
  */
class XlsxScaleSpec extends AnyFunSuite {

  test("100k-row single-sheet workbook parses streaming at >10k rows/s") {
    val nRows = 100000
    val header = Seq(Str("id"), Str("name"), Str("qty"), Str("price"),
      Str("cat"), Str("note"))
    // bounded shared-string pool (realistic: categorical columns pool,
    // free-text mostly doesn't — Num cells exercise the inline path)
    val cats = (0 until 32).map(i => s"cat_$i")
    val rows = Seq(header) ++ (1 to nRows).map { i =>
      Seq(Num(i.toString), Str(s"name_${i % 1000}"), Num((i % 97).toString),
        Num(s"${i % 9000}.${i % 100}"), Str(cats(i % cats.length)),
        Str(s"note_${i % 500}"))
    }
    val path = Files.createTempFile("graft_big_wb", ".xlsx")
    try {
      XlsxWriter.write(path, "Big Sheet", rows)
      def timedParse(): (Double, Seq[(String, Vector[Vector[String]])]) = {
        val t0 = System.nanoTime()
        val p = XlsxIngest.parseMatrices(path.toString)
        ((System.nanoTime() - t0) / 1e9, p)
      }
      val (sec0, parsed) = timedParse()
      // the fidelity asserts below are unconditional; the throughput
      // floor is the suite's only wall-clock assert and a contended
      // machine (sbt test alongside a Spark job; ±20% local variance)
      // could flake it despite ~14x headroom — on a miss, re-parse
      // once and take the faster run. An accidental O(n²) fails both.
      val sec =
        if (nRows / sec0 > 10000) sec0 else math.min(sec0, timedParse()._1)
      assert(parsed.map(_._1) == Seq("Big Sheet"))
      val m = parsed.head._2
      assert(m.length == nRows + 1)
      assert(m.head == Vector("id", "name", "qty", "price", "cat", "note"))
      // corner fidelity: first and last data rows, shared + inline cells
      assert(m(1) == Vector("1", "name_1", "1", "1.1", "cat_1", "note_1"))
      assert(m(nRows) == Vector(nRows.toString, s"name_${nRows % 1000}",
        (nRows % 97).toString, s"${nRows % 9000}.${nRows % 100}",
        cats(nRows % cats.length), s"note_${nRows % 500}"))
      val rps = nRows / sec
      info(f"parsed $nRows%d rows x 6 cols in $sec%.2f s = $rps%.0f rows/s")
      assert(rps > 10000,
        f"single-sheet parse throughput collapsed: $rps%.0f rows/s")
    } finally Files.deleteIfExists(path)
  }
}
