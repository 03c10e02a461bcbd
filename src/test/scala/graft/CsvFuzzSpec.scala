package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{CsvIngest, Sniffer}

/** Property-fuzz of the CSV sniff + parse layer (reference contract:
  * `csv_sniff.py:5-22`, `data.py:30-45`): random tables rendered with
  * a known delimiter — quoted fields with embedded delimiters and
  * `""` escapes, empty fields, CRLF line endings, newline payload
  * padding — must sniff back to that delimiter and parse back to the
  * constructed matrix. Generation is constrained to UNAMBIGUOUS
  * content (no other candidate delimiter appears anywhere, fields are
  * newline-free): ambiguous inputs legitimately sniff differently and
  * their behaviors are pinned by `SnifferSpec`/`CsvIngestSpec`.
  */
class CsvFuzzSpec extends AnyFunSuite with PropHelpers {

  private val Delims = Seq(',', ';', '|', '\t')

  private final case class PTable(
      delim: Char, rows: Vector[Vector[String]],
      quoteCoins: Vector[Vector[Boolean]], crlf: Boolean, pad: Int)

  // cell content: safe chars, sometimes with the CHOSEN delimiter or a
  // quote embedded (forces quoting). Other candidate delimiters are
  // never generated — see the ambiguity note in the class scaladoc.
  private def cellGen(delim: Char): Gen[String] = {
    val safe = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.mkString))
    Gen.frequency(
      6 -> safe,
      1 -> safe.map(s => s + delim + s),
      1 -> safe.map(s => s + "\"" + s))
  }

  private val tableGen: Gen[PTable] = for {
    delim <- Gen.oneOf(Delims)
    nRows <- Gen.choose(2, 8)
    nCols <- Gen.choose(2, 6)
    cells <- Gen.listOfN(nRows * nCols, cellGen(delim))
    coins <- Gen.listOfN(nRows * nCols, Gen.oneOf(true, false))
    crlf <- Gen.oneOf(true, false)
    pad <- Gen.choose(0, 3)
  } yield PTable(delim,
    cells.grouped(nCols).map(_.toVector).toVector,
    coins.grouped(nCols).map(_.toVector).toVector, crlf, pad)

  private def renderField(t: PTable, content: String, coin: Boolean): String = {
    val needsQuote = content.exists(c => c == t.delim || c == '"')
    if (needsQuote || coin) "\"" + content.replace("\"", "\"\"") + "\""
    else content
  }

  private def renderBody(t: PTable): String = {
    val sep = if (t.crlf) "\r\n" else "\n"
    t.rows.zip(t.quoteCoins).map { case (r, cs) =>
      r.zip(cs).map { case (c, coin) => renderField(t, c, coin) }
        .mkString(t.delim.toString)
    }.mkString(sep)
  }

  test("property: rendered tables sniff back to their delimiter and parse to the matrix") {
    forAll(tableGen, n = 120) { t =>
      val body = renderBody(t)
      val sniffed = Sniffer.sniffDelimiter(body)
      assert(sniffed == t.delim,
        s"sniffed '$sniffed' != '${t.delim}'\nbody=\n$body")
      val parsed = Sniffer.parse(body, sniffed)
      assert(parsed == t.rows, s"\nbody=\n$body\ngot=$parsed\nwant=${t.rows}")
    }
  }

  test("property: fromString roundtrips values through newline padding and the sniff") {
    val spark = TestSpark.spark
    forAll(tableGen, n = 25) { t =>
      // an index first column gives a stable order to compare on and
      // guarantees a non-empty first header cell
      val withIdx = t.rows.zipWithIndex.map { case (r, i) =>
        (if (i == 0) "idx" else s"r${i - 1}") +: r
      }
      val t2 = t.copy(rows = withIdx,
        quoteCoins = t.quoteCoins.map(false +: _))
      val payload = ("\n" * t2.pad) + renderBody(t2) + ("\n" * t2.pad)
      val df = CsvIngest.fromString(spark, payload)
      val got = df.collect()
        .map(r => (0 until r.length).map(r.getString))
        .sortBy(_.head).toVector
      val want = t2.rows.tail.sortBy(_.head)
      assert(got.map(_.toVector) == want,
        s"\npayload=\n$payload\ngot=$got\nwant=$want")
    }
  }
}
