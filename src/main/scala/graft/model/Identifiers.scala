package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Identifier sanitization semantics of the reference engine.
  *
  *  - `sqlify` (table names): lowercase, then collapse every run of
  *    non-alphanumeric characters into a single `_`.
  *    Ref: excel-to-database `app/data.py:84-85`.
  *  - `toAlnum` (column names): keep only alphanumeric characters and
  *    `_`, preserving case. Python's `str.isalnum` is Unicode-aware, so
  *    the pure port uses `Character.isLetterOrDigit`.
  *    Ref: excel-to-database `app/data.py:24-27`.
  *
  * Both are also exposed as `Column` combinators (pure builtin
  * expressions → whole-stage codegen, no UDF). The Column variants use
  * the ASCII char classes of the reference's `sqlify` regex; `toAlnumCol`
  * matches `toAlnum` exactly on ASCII input.
  */
object Identifiers {

  def sqlify(name: String): String =
    "[^a-zA-Z0-9]+".r.replaceAllIn(name.toLowerCase, "_")

  def toAlnum(s: String): String =
    s.filter(c => Character.isLetterOrDigit(c) || c == '_')

  def sqlifyCol(c: Column): Column =
    regexp_replace(lower(c), "[^a-zA-Z0-9]+", "_")

  def toAlnumCol(c: Column): Column =
    regexp_replace(c, "[^a-zA-Z0-9_]", "")

  /** Quote-doubling projection used by the reference when building SQL
    * literals (`app/data.py:192`). Kept as a declared op; our writers
    * use bound JDBC parameters instead (fixes reference bug B6).
    */
  def escapeQuotesCol(c: Column): Column =
    regexp_replace(c, "'", "''")

  /** Apply `toAlnum` to every column name — the reference sanitizes the
    * header row when generating DDL (`app/data.py:57-62`, `:121`).
    */
  def sanitizeHeader(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(toAlnum).toIndexedSeq: _*)
}
