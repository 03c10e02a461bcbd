package graft.expr

/** A1-style cell-reference decoding, porting the reference's client
  * parser (`app/static/xlsparser.js:85-102`): `"BC12"` → (row 12,
  * col 55). Column letters are base-26 with A=1 (no zero digit).
  */
object A1Ref {

  /** `"A"`→1, `"Z"`→26, `"AA"`→27, ... Input is trimmed like the
    * reference's `$.trim(col)`. Non-letter input → 0 contributions
    * (the reference's `letters.indexOf` returns -1; we reject instead).
    */
  def colToInt(col: String): Int = {
    val s = col.trim
    require(s.nonEmpty && s.forall(c => c >= 'A' && c <= 'Z'),
      s"not a column ref: '$col'")
    // 6 letters tops out at ~3.2e8; 7+ would overflow Int into a
    // silently-wrong (possibly negative) ordinal — xlsx column refs
    // max out at XFD (3 letters), so reject rather than wrap
    require(s.length <= 6, s"column ref too long: '$col'")
    s.foldLeft(0)((n, c) => n * 26 + (c - 'A' + 1))
  }

  def intToCol(n: Int): String = {
    require(n >= 1, s"column ordinal must be >= 1, got $n")
    val sb = new StringBuilder
    var x = n
    while (x > 0) {
      val r = (x - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      x = (x - 1) / 26
    }
    sb.result()
  }

  private val RefPattern = "^([A-Z]+)([0-9]+)$".r

  /** `"BC12"` → (row = 12, col = 55), mirroring `new Cell(cellRef)`
    * (`xlsparser.js:98-102`).
    */
  def parse(ref: String): (Int, Int) = ref.trim match {
    // the digit-count bound keeps toInt from throwing a raw
    // NumberFormatException (the documented failure is
    // IllegalArgumentException) on an oversized row from a malformed
    // file; xlsx rows max out at 1,048,576 (7 digits)
    case RefPattern(letters, digits) if digits.length <= 9 =>
      (digits.toInt, colToInt(letters))
    case other => throw new IllegalArgumentException(s"not an A1 ref: '$other'")
  }
}
