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
    * @param shape   exact regex of strings this format COULD accept —
    *                a pre-compiled gate in front of the (much costlier)
    *                DateTimeFormatter attempt. Also pins `yyyy` to 4
    *                digits, where bare Java would accept 5+ (Python's
    *                `%Y` would not)
    */
  final case class Fmt(python: String, java: String, hasTime: Boolean, shape: String)

  private val T = "\\ \\d{1,2}:\\d{1,2}:\\d{1,2}"

  /** ETL_PROJECT.py:48-54 order, verbatim. */
  val formats: Seq[Fmt] = Seq(
    Fmt("%Y-%m-%d", "yyyy-M-d", hasTime = false, "^\\d{4}-\\d{1,2}-\\d{1,2}$"),
    Fmt("%Y/%m/%d", "yyyy/M/d", hasTime = false, "^\\d{4}/\\d{1,2}/\\d{1,2}$"),
    Fmt("%d-%m-%Y", "d-M-yyyy", hasTime = false, "^\\d{1,2}-\\d{1,2}-\\d{4}$"),
    Fmt("%d/%m/%Y", "d/M/yyyy", hasTime = false, "^\\d{1,2}/\\d{1,2}/\\d{4}$"),
    Fmt("%m-%d-%Y", "M-d-yyyy", hasTime = false, "^\\d{1,2}-\\d{1,2}-\\d{4}$"),
    Fmt("%m/%d/%Y", "M/d/yyyy", hasTime = false, "^\\d{1,2}/\\d{1,2}/\\d{4}$"),
    Fmt("%Y.%m.%d", "yyyy.M.d", hasTime = false, "^\\d{4}\\.\\d{1,2}\\.\\d{1,2}$"),
    Fmt("%d.%m.%Y", "d.M.yyyy", hasTime = false, "^\\d{1,2}\\.\\d{1,2}\\.\\d{4}$"),
    Fmt("%m.%d.%Y", "M.d.yyyy", hasTime = false, "^\\d{1,2}\\.\\d{1,2}\\.\\d{4}$"),
    Fmt("%Y%m%d", "yyyyMMdd", hasTime = false, "^\\d{8}$"),
    Fmt("%d%m%Y", "ddMMyyyy", hasTime = false, "^\\d{8}$"),
    Fmt("%m%d%Y", "MMddyyyy", hasTime = false, "^\\d{8}$"),
    Fmt("%Y-%m-%d %H:%M:%S", "yyyy-M-d H:m:s", hasTime = true, s"^\\d{4}-\\d{1,2}-\\d{1,2}$T$$"),
    Fmt("%Y/%m/%d %H:%M:%S", "yyyy/M/d H:m:s", hasTime = true, s"^\\d{4}/\\d{1,2}/\\d{1,2}$T$$"),
    Fmt("%d-%m-%Y %H:%M:%S", "d-M-yyyy H:m:s", hasTime = true, s"^\\d{1,2}-\\d{1,2}-\\d{4}$T$$"),
    Fmt("%d/%m/%Y %H:%M:%S", "d/M/yyyy H:m:s", hasTime = true, s"^\\d{1,2}/\\d{1,2}/\\d{4}$T$$"),
  )

  /** First-match-wins parse of a string column to DATE; null when no
    * format matches (reference: ETL_PROJECT.py:43-61). `try_to_timestamp`
    * is ANSI-safe (never throws) and strict about leftover input, and a
    * timestamp->date cast never fails, so the whole expression is total.
    *
    * A cheap shape prefilter guards the 16 parser attempts: every format
    * is 8-19 chars, starts with a digit, and draws only from
    * `[0-9./: -]` — strings outside that shape (free text, long
    * fractional timestamps, nulls) skip all 16 DateTimeFormatter calls.
    * Semantics are unchanged (the prefilter is implied by the formats);
    * detection over a wide table gets ~10x cheaper.
    */
  def parseDate(c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    import org.apache.spark.sql.types.StringType
    ExprBridge.column(StaticInvoke(
      DateKernels.getClass, DateType, "parseDate16",
      Seq(ExprBridge.expression(c.cast(StringType))), Seq(StringType),
      propagateNull = true, returnNullable = true))
  }

  /** The pure-expression formulation (16 shape-gated try_to_timestamp
    * branches) — kept as the executable spec of [[parseDate]]'s kernel;
    * DateFormatsSpec asserts the two agree on the golden table.
    */
  def parseDateExpr(c: Column): Column = {
    val t = trim(c)
    val shaped = length(t).between(8, 19) && t.rlike("^[0-9][0-9./: -]*$")
    when(shaped, coalesce(formats.map { f =>
      when(t.rlike(f.shape), try_to_timestamp(t, lit(f.java)).cast(DateType))
        .otherwise(lit(null).cast(DateType))
    }: _*)).otherwise(lit(null).cast(DateType))
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
