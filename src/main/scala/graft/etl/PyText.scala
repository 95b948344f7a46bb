package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Python-compatible text primitives.
  *
  * Python `str.title()` differs from Spark's `initcap`: it upper-cases
  * the first LETTER after any non-letter boundary ("n/a" -> "N/A",
  * "a-b" -> "A-B", "3rd" -> "3Rd"), whereas `initcap` only breaks on
  * whitespace. The reference's categorical cleaner uses `.str.title()`
  * (reference: ETL_PROJECT.py:108), so we replicate CPython semantics
  * exactly (SURVEY.md trap P3).
  *
  * Exposed as a codegen-friendly [[StaticInvoke]] expression (a static
  * JVM call inside whole-stage codegen) rather than a ScalaUDF, so the
  * cleaner `select` stays in one codegen span.
  */
object PyText {

  /** CPython str.title(): title-case the first cased char of every run
    * of cased chars, lower-case the rest. Cased = upper/lower/titlecase
    * letter (close enough to CPython's definition for BMP+ letters).
    * Called from generated code; must handle nulls (propagateNull guards).
    */
  def title(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var prevCased = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val cased = Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
        Character.getType(cp) == Character.TITLECASE_LETTER
      val out =
        if (cased && !prevCased) Character.toTitleCase(cp)
        else if (cased) Character.toLowerCase(cp)
        else cp
      sb.appendCodePoint(out)
      prevCased = cased
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column wrapper over [[title]]. */
  def pyTitle(c: Column): Column = ExprBridge.column(
    StaticInvoke(
      PyText.getClass,
      StringType,
      "title",
      Seq(ExprBridge.expression(c)),
      Seq(StringType),
      propagateNull = true,
      returnNullable = true))
}
