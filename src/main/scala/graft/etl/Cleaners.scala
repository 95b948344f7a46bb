package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Per-type column cleaners (reference: ETL_PROJECT.py:63-127), as pure
  * `Column` expressions so one `select` cleans the whole table in a
  * single codegen'd pass (the reference does one full pandas pass per
  * column instead).
  *
  * The three null-like string sets are deliberately distinct per
  * cleaner (SURVEY.md trap P6) and the categorical set is applied AFTER
  * title-casing, so "nan"->"Nan" and "NULL"->"Null" escape it while
  * "n/a"->"N/A" is caught (trap P2) — replicated, not "fixed".
  */
object Cleaners {

  /** reference: ETL_PROJECT.py:69 */
  val numericNullLikes: Seq[String] = Seq("", "nan", "None", "NULL")
  /** reference: ETL_PROJECT.py:81-85 */
  val textNullLikes: Seq[String] =
    Seq("", "nan", "None", "NULL", "N/A", "n/a", "null", "NaN")
  /** reference: ETL_PROJECT.py:109-112 (checked post-title-case) */
  val categoricalNullLikes: Seq[String] =
    Seq("", "nan", "None", "NULL", "N/A", "n/a")

  /** Exact-match (not substring) null-like replacement, like pandas
    * `Series.replace(dict)`.
    */
  def mapNullLikes(c: Column, nullLikes: Seq[String]): Column =
    when(c.isin(nullLikes.map(lit): _*), lit(null).cast(StringType)).otherwise(c)

  /** C1 — numeric clean (reference: ETL_PROJECT.py:63-76): keep only
    * `[0-9.,+-]`, turn European decimal commas into dots (knowingly
    * breaking "1,234.56" like the reference does), null-map, cast.
    *
    * Kernel-backed ([[CleanKernels.cleanNumeric]]): the regexp_replace
    * formulation allocates a Matcher per value and the cast throws per
    * invalid value — together the hot cost of the cleaning projection
    * at millions of rows. The kernel is one char scan + a shape check,
    * allocation- and exception-free. [[cleanNumericExpr]] is the
    * executable spec; a fuzz test pins kernel == expression.
    */
  def cleanNumeric(c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ExprBridge
    ExprBridge.column(StaticInvoke(
      CleanKernels.getClass, DoubleType, "cleanNumeric",
      Seq(ExprBridge.expression(c.cast(StringType))), Seq(StringType),
      propagateNull = true, returnNullable = true))
  }

  /** The pure-expression formulation of C1 (see [[cleanNumeric]]). */
  def cleanNumericExpr(c: Column): Column = {
    val stripped = regexp_replace(c.cast(StringType), "[^0-9.,+-]", "")
    val dotted   = translate(stripped, ",", ".")
    mapNullLikes(dotted, numericNullLikes).try_cast(DoubleType)
  }

  /** C2 — text clean (reference: ETL_PROJECT.py:78-92). Whitespace
    * collapsing is gated on the column's mean cleaned length > 20; that
    * is a column-level decision made by the caller from an aggregate
    * (the reference decides the same way on the driver).
    */
  def cleanText(c: Column, collapseWhitespace: Boolean): Column = {
    val t = mapNullLikes(trim(c.cast(StringType)), textNullLikes)
    if (collapseWhitespace) regexp_replace(t, "\\s+", " ") else t
  }

  /** C4 part 1 — categorical normalize (reference: ETL_PROJECT.py:108-112):
    * strip + Python-title-case, then null-map (post-title-case, trap P2).
    */
  def cleanCategoricalBase(c: Column): Column =
    mapNullLikes(PyText.pyTitle(trim(c.cast(StringType))), categoricalNullLikes)

  /** C4 part 2 — fold the (driver-collected) rare value set to "Other"
    * (reference: ETL_PROJECT.py:115-121). The rare set is bounded by the
    * `< 50 distinct` gate, so `isin` compiles to a tiny in-list — the
    * scale-safe equivalent of a broadcast semi-join.
    */
  def foldRare(c: Column, rare: Seq[String]): Column =
    if (rare.isEmpty) c
    else when(c.isin(rare.map(lit): _*), lit("Other")).otherwise(c)

  /** C3 — date clean (reference: ETL_PROJECT.py:94-104). */
  def cleanDate(c: Column): Column = DateFormats.parseDate(c.cast(StringType))
}
