package graft.etl

import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop JVM kernel for the 16-format first-match date parse
  * (invoked from codegen via StaticInvoke — see
  * [[DateFormats.parseDate]]).
  *
  * The expression formulation (16 `rlike` shape gates + 16
  * `try_to_timestamp` attempts) allocates a regex Matcher and a JVM
  * String per format per row — profiled at ~50µs/row, dominating the
  * whole-table detection aggregate. This kernel does one trim, one
  * charset scan, and digit-group parsing with `LocalDate.of` range
  * validation (the same strict calendar semantics as Spark's
  * try_to_timestamp and CPython's strptime on the fixture domain:
  * 4-digit years, single-space datetime separator).
  *
  * Format order is EXACTLY ETL_PROJECT.py:48-54 (see
  * [[DateFormats.formats]]): a string with a time part can only match
  * the 4 datetime formats (13-16) and one without only the 12
  * date-only formats, so splitting on the first space preserves
  * first-match order. `DateFormatsSpec`'s CPython-derived goldens pin
  * kernel == formats-table semantics.
  */
object DateKernels {

  /** Days since epoch, or null when no format matches. */
  def parseDate16(s: UTF8String): Integer = {
    if (s == null) return null
    val t = s.toString.trim
    val n = t.length
    if (n < 8 || n > 19) return null
    if (!isDigit(t.charAt(0))) return null
    var i = 0
    while (i < n) {
      val c = t.charAt(i)
      if (!(isDigit(c) || c == '-' || c == '/' || c == '.' || c == ':' || c == ' ')) return null
      i += 1
    }
    val sp = t.indexOf(' ')
    if (sp < 0) parseDateOnly(t)
    else {
      if (!validTime(t, sp + 1)) return null
      val d = t.substring(0, sp)
      // datetime formats (order 13-16): yyyy-M-d, yyyy/M/d, d-M-yyyy, d/M/yyyy
      val r1 = ymd(d, '-'); if (r1 != null) return r1
      val r2 = ymd(d, '/'); if (r2 != null) return r2
      val r3 = dmy(d, '-'); if (r3 != null) return r3
      dmy(d, '/')
    }
  }

  private def parseDateOnly(t: String): Integer = {
    // order 1-12: ymd- ymd/ dmy- dmy/ mdy- mdy/ ymd. dmy. mdy. compact x3
    val r1 = ymd(t, '-'); if (r1 != null) return r1
    val r2 = ymd(t, '/'); if (r2 != null) return r2
    val r3 = dmy(t, '-'); if (r3 != null) return r3
    val r4 = dmy(t, '/'); if (r4 != null) return r4
    val r5 = mdy(t, '-'); if (r5 != null) return r5
    val r6 = mdy(t, '/'); if (r6 != null) return r6
    val r7 = ymd(t, '.'); if (r7 != null) return r7
    val r8 = dmy(t, '.'); if (r8 != null) return r8
    val r9 = mdy(t, '.'); if (r9 != null) return r9
    if (t.length == 8 && allDigits(t)) {
      val c1 = mk(num(t, 0, 4), num(t, 4, 6), num(t, 6, 8)) // yyyyMMdd
      if (c1 != null) return c1
      val c2 = mk(num(t, 4, 8), num(t, 2, 4), num(t, 0, 2)) // ddMMyyyy
      if (c2 != null) return c2
      return mk(num(t, 4, 8), num(t, 0, 2), num(t, 2, 4))   // MMddyyyy
    }
    null
  }

  /** Split into exactly 3 digit groups on `delim`; group length limits
    * (4 / 1-2) mirror the Java patterns (`yyyy` / `M` / `d`).
    */
  private def parts(t: String, delim: Char): Array[Int] = {
    val i1 = t.indexOf(delim)
    if (i1 <= 0) return null
    val i2 = t.indexOf(delim, i1 + 1)
    if (i2 < 0 || i2 == i1 + 1) return null
    if (t.indexOf(delim, i2 + 1) >= 0) return null
    if (i2 == t.length - 1) return null
    val a = num(t, 0, i1)
    val b = num(t, i1 + 1, i2)
    val c = num(t, i2 + 1, t.length)
    if (a < 0 || b < 0 || c < 0) return null
    Array(a, b, c, i1, i2 - i1 - 1, t.length - i2 - 1) // values + widths
  }

  // INTENTIONAL DEVIATION from CPython strptime (and DuckDB
  // try_strptime, which is equally lenient): %Y accepts 1-4 digit
  // years ('202-1-12' -> year 202); these kernels — like the Fmt shape
  // regexes and the Java 'yyyy' pattern in the expression fallback —
  // pin year fields to exactly 4 digits. Sub-4-digit years are
  // ambiguous noise in ETL input ('11-12-13' as year 11?); the engine
  // rejects them everywhere, consistently. Note the oracle rendering
  // (DateFormats.oracleSql) inherits DuckDB's leniency, so a fixture
  // containing a 1-3-digit year WOULD diverge — none does; revisit if
  // the fixture domain ever grows such strings.
  private def ymd(t: String, delim: Char): Integer = {
    val p = parts(t, delim)
    if (p == null || p(3) != 4 || p(4) > 2 || p(5) > 2) null
    else mk(p(0), p(1), p(2))
  }

  private def dmy(t: String, delim: Char): Integer = {
    val p = parts(t, delim)
    if (p == null || p(3) > 2 || p(4) > 2 || p(5) != 4) null
    else mk(p(2), p(1), p(0))
  }

  private def mdy(t: String, delim: Char): Integer = {
    val p = parts(t, delim)
    if (p == null || p(3) > 2 || p(4) > 2 || p(5) != 4) null
    else mk(p(2), p(0), p(1))
  }

  /** Strict calendar validation, like java.time / CPython. */
  private def mk(y: Int, m: Int, d: Int): Integer = {
    if (m < 1 || m > 12 || d < 1 || d > 31) return null
    try Integer.valueOf(java.time.LocalDate.of(y, m, d).toEpochDay.toInt)
    catch { case _: java.time.DateTimeException => null }
  }

  /** `H:m:s` with 1-2 digit fields, 0-23 / 0-59 / 0-59. */
  private def validTime(t: String, from: Int): Boolean = {
    val s = t.substring(from)
    val i1 = s.indexOf(':')
    if (i1 <= 0 || i1 > 2) return false
    val i2 = s.indexOf(':', i1 + 1)
    if (i2 < 0 || i2 - i1 - 1 < 1 || i2 - i1 - 1 > 2) return false
    if (s.indexOf(':', i2 + 1) >= 0) return false
    val rest = s.length - i2 - 1
    if (rest < 1 || rest > 2) return false
    val h = num(s, 0, i1); val m = num(s, i1 + 1, i2); val sec = num(s, i2 + 1, s.length)
    h >= 0 && h <= 23 && m >= 0 && m <= 59 && sec >= 0 && sec <= 59
  }

  private def num(t: String, from: Int, until: Int): Int = {
    if (until <= from) return -1
    var v = 0
    var i = from
    while (i < until) {
      val c = t.charAt(i)
      if (!isDigit(c)) return -1
      v = v * 10 + (c - '0')
      i += 1
    }
    v
  }

  private def allDigits(t: String): Boolean = {
    var i = 0
    while (i < t.length) { if (!isDigit(t.charAt(i))) return false; i += 1 }
    true
  }

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
}
