package graft.etl

import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for the C1 numeric cleaner (see
  * [[Cleaners.cleanNumeric]]): strip to `[0-9.,+-]`, comma→dot,
  * empty→null, parse.
  *
  * The parse accepts exactly `sign? digits* dot? digits*` with at
  * least one digit and at most one dot — verified empirically to be
  * DuckDB `try_cast(VARCHAR AS DOUBLE)`'s acceptance on the stripped
  * domain (no exponents survive the strip: 'e' is not in the kept
  * set), so shape-validation happens before `Double.parseDouble` and
  * the kernel never throws.
  */
object CleanKernels {

  def cleanNumeric(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if ((c >= '0' && c <= '9') || c == '.' || c == '+' || c == '-') sb.append(c)
      else if (c == ',') sb.append('.')
      i += 1
    }
    val n = sb.length
    if (n == 0) return null // the only reachable numeric null-like post-strip
    // shape check: sign? digits* dot? digits*, >=1 digit, <=1 dot
    var j = 0
    val first = sb.charAt(0)
    if (first == '+' || first == '-') j = 1
    var digits = 0
    var dots = 0
    while (j < n) {
      val c = sb.charAt(j)
      if (c >= '0' && c <= '9') digits += 1
      else if (c == '.') dots += 1
      else return null // a second sign anywhere
      j += 1
    }
    if (digits == 0 || dots > 1) return null
    java.lang.Double.valueOf(sb.toString)
  }
}
