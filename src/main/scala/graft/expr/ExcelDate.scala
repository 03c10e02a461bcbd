package graft.expr

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Excel 1900-date-system serial → calendar date.
  *
  * The reference converts date-styled cells client-side with
  * `new Date(1900,0,1); dt.setDate(serial)` then `toISOString`
  * (`app/static/xlsparser.js:168-183`), i.e. `1899-12-31 + serial`
  * days — and explicitly leaves Excel's 1900 leap-year bug in place
  * (comment at `xlsparser.js:174-177`): for serials >= 60 the result is
  * one day ahead of the date Excel displays. It is also local-timezone
  * unstable (reference bug B7); we compute in pure calendar days (UTC
  * semantics), which matches the reference's arithmetic exactly.
  *
  *  - `leapBugCompat = true` (default): `1899-12-31 + serial` — faithful
  *    to the reference for every serial.
  *  - `leapBugCompat = false`: the date Excel itself displays:
  *    serial < 60 → `1899-12-31 + serial`; serial >= 60 →
  *    `1899-12-30 + serial` (serial 60, Excel's fictitious 1900-02-29,
  *    maps to 1900-02-28; serial 61 = 1900-03-01 as in Excel).
  */
object ExcelDate {

  private val epochCompat = LocalDate.of(1899, 12, 31)
  private val epochFixed = LocalDate.of(1899, 12, 30)

  def toDate(serial: Int, leapBugCompat: Boolean = true): LocalDate =
    if (leapBugCompat || serial < 60) epochCompat.plusDays(serial.toLong)
    else epochFixed.plusDays(serial.toLong)

  /** Column form: pure builtin `date_add` expressions (codegen'd). */
  def toDateCol(serial: Column, leapBugCompat: Boolean = true): Column = {
    val compat = date_add(to_date(lit("1899-12-31")), serial)
    if (leapBugCompat) compat
    else
      when(serial < 60, compat)
        .otherwise(date_add(to_date(lit("1899-12-30")), serial))
  }
}
