package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** CSV delimiter sniffing, porting excel-to-database
  * `app/csv_sniff.py:5-22` exactly:
  *
  *  - candidates tried in order `, ; | \t`;
  *  - a candidate is *valid* iff the sample parses (RFC-4180-style
  *    quoting, like Python's `csv.reader`) and every row has the same
  *    field count as the first row;
  *  - the winner is the valid candidate with the strictly largest field
  *    count (first wins ties); none valid → the default `,`.
  *
  * The sniff sample is capped at 10 lines by callers
  * (`app/data.py:36-41`) — see [[CsvIngest]].
  */
object Sniffer {

  val DefaultCandidates: String = ",;|\t"

  def sniffDelimiter(
      sample: String,
      candidates: String = DefaultCandidates,
      default: Char = ','): Char = {
    var maxCount = 0
    var best = default
    for (c <- candidates) {
      val rows = parse(sample, c)
      if (rows.nonEmpty) {
        val w = rows.head.length
        if (rows.forall(_.length == w) && w > maxCount) {
          maxCount = w
          best = c
        }
      }
    }
    best
  }

  /** Minimal RFC-4180 parser (quoted fields, `""` escapes, newlines
    * inside quotes), mirroring Python `csv.reader` on the inputs the
    * sniffer sees. Rows are separated by `\n` / `\r\n`; a trailing
    * newline does not produce an empty row.
    */
  def parse(text: String, delimiter: Char): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    val row = new ArrayBuffer[String]
    val field = new StringBuilder
    var inQuotes = false
    var atFieldStart = true // quotes are only special here (csv.reader)
    var sawAny = false // any char since last row flush
    var i = 0
    def endField(): Unit = {
      row += field.result(); field.clear(); atFieldStart = true
    }
    def endRow(): Unit = {
      endField()
      rows += row.toVector
      row.clear()
      sawAny = false
    }
    while (i < text.length) {
      val ch = text.charAt(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') {
            field.append('"'); i += 1
          } else inQuotes = false
        } else field.append(ch)
      } else ch match {
        case '"' if atFieldStart =>
          // a quote mid-field is literal in Python's csv.reader; only a
          // quote at field start opens a quoted section
          inQuotes = true; atFieldStart = false; sawAny = true
        case `delimiter` => endField(); sawAny = true
        case '\r' => // swallow; the matching \n ends the row
          sawAny = true
          if (i + 1 >= text.length || text.charAt(i + 1) != '\n') endRow()
        case '\n' => endRow()
        case c => field.append(c); atFieldStart = false; sawAny = true
      }
      i += 1
    }
    if (sawAny || field.nonEmpty || row.nonEmpty) endRow()
    rows.result()
  }
}
