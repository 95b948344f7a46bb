package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** The multi-format date parser: 16 formats tried in fixed order,
  * first match wins, result truncated to a date.
  *
  * Single source of truth for the Python (reference semantics,
  * ETL_PROJECT.py:48-54), Spark (Java time patterns) and DuckDB
  * (oracle, %-codes) renderings of each format. Keeping all three in
  * one table is what makes the three engines agree (SURVEY.md trap P1).
  *
  * Parity notes, verified empirically against Spark 4.1.2 + DuckDB:
  *  - all three engines are STRICT about trailing characters
  *    ("2023-01-01 10:00" does NOT match yyyy-M-d);
  *  - all three accept 1-2 digit month/day for the delimited forms
  *    (Python %m, Java M, DuckDB %m);
  *  - compact forms are fixed-width in all three (yyyyMMdd etc.);
  *  - all three validate calendar ranges (month 13 -> no match).
  */
object DateFormats {

  /** One format in the fixed-order table.
    * @param python  CPython strptime / DuckDB strptime %-codes
    * @param java    Spark DateTimeFormatter pattern
    * @param hasTime datetime variant (parsed then truncated to date)
    */
  final case class Fmt(python: String, java: String, hasTime: Boolean)

  /** ETL_PROJECT.py:48-54 order, verbatim. */
  val formats: Seq[Fmt] = Seq(
    Fmt("%Y-%m-%d", "yyyy-M-d", hasTime = false),
    Fmt("%Y/%m/%d", "yyyy/M/d", hasTime = false),
    Fmt("%d-%m-%Y", "d-M-yyyy", hasTime = false),
    Fmt("%d/%m/%Y", "d/M/yyyy", hasTime = false),
    Fmt("%m-%d-%Y", "M-d-yyyy", hasTime = false),
    Fmt("%m/%d/%Y", "M/d/yyyy", hasTime = false),
    Fmt("%Y.%m.%d", "yyyy.M.d", hasTime = false),
    Fmt("%d.%m.%Y", "d.M.yyyy", hasTime = false),
    Fmt("%m.%d.%Y", "M.d.yyyy", hasTime = false),
    Fmt("%Y%m%d", "yyyyMMdd", hasTime = false),
    Fmt("%d%m%Y", "ddMMyyyy", hasTime = false),
    Fmt("%m%d%Y", "MMddyyyy", hasTime = false),
    Fmt("%Y-%m-%d %H:%M:%S", "yyyy-M-d H:m:s", hasTime = true),
    Fmt("%Y/%m/%d %H:%M:%S", "yyyy/M/d H:m:s", hasTime = true),
    Fmt("%d-%m-%Y %H:%M:%S", "d-M-yyyy H:m:s", hasTime = true),
    Fmt("%d/%m/%Y %H:%M:%S", "d/M/yyyy H:m:s", hasTime = true),
  )

  /** First-match-wins parse of a string column to DATE; null when no
    * format matches (reference: ETL_PROJECT.py:43-61). `try_to_timestamp`
    * is ANSI-safe (never throws) and strict about leftover input, and a
    * timestamp->date cast never fails, so the whole expression is total.
    */
  def parseDate(c: Column): Column = {
    val t = trim(c)
    coalesce(formats.map { f =>
      try_to_timestamp(t, lit(f.java)).cast(DateType)
    }: _*)
  }

  /** DuckDB rendering of [[parseDate]] for the oracle SQL:
    * `try_strptime(expr, [fmts...])` tries the list in order (first
    * match wins) — semantics identical to the reference loop.
    */
  def duckdbParseDate(expr: String): String = {
    val fmts = formats.map(f => s"'${f.python}'").mkString(", ")
    s"CAST(try_strptime(trim($expr), [$fmts]) AS DATE)"
  }

  /** Spark SQL (string) rendering, for queries authored as SQL text. */
  def sparkSqlParseDate(expr: String): String = {
    val branches = formats
      .map(f => s"try_to_timestamp(trim($expr), '${f.java}')")
      .mkString(", ")
    s"CAST(coalesce($branches) AS DATE)"
  }
}
