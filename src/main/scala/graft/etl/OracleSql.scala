package graft.etl

/** DuckDB-SQL renderings of the engine's cleaner/detector expressions,
  * for the driver's oracle compare (BASELINE.md t2 gate).
  *
  * Every function here mirrors, string-for-string where the dialects
  * overlap, a `Column` expression in [[Cleaners]] / [[TypeDetector]] /
  * [[DateFormats]]. Keeping both renderings next to their Scala twin
  * (or generated from the same constant tables) is what keeps the two
  * engines in lockstep (SURVEY.md §2.8 traps P1/P3/P5).
  *
  * Dialect gotchas encoded here (verified empirically on DuckDB 1.0):
  *  - DuckDB `regexp_replace` replaces only the FIRST match unless the
  *    'g' flag is passed; Spark's is always global.
  *  - DuckDB literal `1.0` is DECIMAL, not DOUBLE — always CAST.
  *  - Rounding: both engines share `floor(x * 10^k + 0.5) / 10^k`
  *    (plain IEEE ops, bit-identical); Spark's `round()` goes through
  *    BigDecimal.valueOf (decimal string) while DuckDB rounds the
  *    binary value — they disagree on values like 2.675.
  */
object OracleSql {

  def inList(items: Seq[String]): String =
    items.map(s => "'" + s.replace("'", "''") + "'").mkString(", ")

  /** Let-binding via a single-element list lambda: binds `expr` to
    * variable `v` inside `body` so a sub-expression used N times is
    * written (and evaluated) once instead of exploding exponentially.
    */
  def let(expr: String, v: String, body: String): String =
    s"list_transform([$expr], $v -> $body)[1]"

  /** Exact-match null-like mapping (mirrors [[Cleaners.mapNullLikes]]). */
  def mapNullLikes(e: String, likes: Seq[String]): String =
    s"(CASE WHEN $e IN (${inList(likes)}) THEN NULL ELSE $e END)"

  /** C1 — mirrors [[Cleaners.cleanNumeric]]. */
  def cleanNumeric(e: String): String = {
    val stripped = s"regexp_replace(CAST($e AS VARCHAR), '[^0-9.,+-]', '', 'g')"
    val dotted   = s"replace($stripped, ',', '.')"
    s"try_cast(${let(dotted, "s", mapNullLikes("s", Cleaners.numericNullLikes))} AS DOUBLE)"
  }

  /** C2 without the whitespace collapse — mirrors
    * [[Cleaners.cleanText]](c, collapseWhitespace = false).
    */
  def cleanTextBase(e: String): String =
    let(s"trim(CAST($e AS VARCHAR))", "s", mapNullLikes("s", Cleaners.textNullLikes))

  /** The collapse step of C2 (applied after [[cleanTextBase]]). */
  def collapseWs(e: String): String =
    s"regexp_replace($e, '\\s+', ' ', 'g')"

  /** Python `str.title()` for ASCII input — mirrors [[PyText.title]]
    * (upper-case the first letter of every letter-run, lower the rest;
    * '/' and '_' are boundaries, unlike initcap). Fixture values are
    * ASCII; the full Unicode semantics live only on the Spark side and
    * are covered by ScalaTest goldens (SURVEY.md §7.6 #2).
    */
  def pyTitleAscii(e: String): String =
    let(s"CAST($e AS VARCHAR)", "s0",
      let("string_split(s0, '')", "ch",
        "list_aggregate(list_transform(range(1, len(ch)+1), i -> " +
          "CASE WHEN regexp_matches(ch[i], '^[A-Za-z]$') " +
          "THEN CASE WHEN i = 1 OR NOT regexp_matches(ch[i-1], '^[A-Za-z]$') " +
          "THEN upper(ch[i]) ELSE lower(ch[i]) END " +
          "ELSE ch[i] END), 'string_agg', '')"))

  /** C4 base — mirrors [[Cleaners.cleanCategoricalBase]]: strip,
    * Python-title, THEN null-map (trap P2 order).
    */
  def cleanCategoricalBase(e: String): String =
    let(pyTitleAscii(s"trim(CAST($e AS VARCHAR))"), "t",
      mapNullLikes("t", Cleaners.categoricalNullLikes))

  /** T1 — one detection row for `column` of `table`, mirroring
    * [[TypeDetector.profile]] + [[TypeDetector.decide]] rule-for-rule.
    */
  def detectSql(table: String, column: String): String = {
    val s = s"CAST($column AS VARCHAR)"
    s"""SELECT '$table' AS table_name, '$column' AS column_name,
       |  CASE WHEN n = 0 THEN 'unknown'
       |       WHEN datep * 1.0 / n > 0.7 THEN 'date'
       |       WHEN nump * 1.0 / n > 0.7 THEN 'numeric'
       |       WHEN dist > 0 AND dist * 1.0 / n <= 0.3 AND dist < 50 THEN 'categorical'
       |       WHEN alen > 10 AND dist * 1.0 / n > 0.5 THEN 'text'
       |       ELSE 'unknown' END AS detected
       |FROM (SELECT count(s) AS n,
       |             count(CASE WHEN ${DateFormats.duckdbParseDate("s")} IS NOT NULL THEN 1 END) AS datep,
       |             count(CASE WHEN ${TypeDetector.duckdbNumericParses("s")} THEN 1 END) AS nump,
       |             count(DISTINCT s) AS dist,
       |             avg(length(s)) AS alen
       |      FROM (SELECT $s AS s FROM $table) __t) __a""".stripMargin
  }

  /** The shared float normalizer: round-half-up to 4 decimals via
    * plain IEEE ops (see class doc). Spark twin: `Norm.n4`.
    */
  def n4(e: String): String = s"(floor(($e) * 10000 + 0.5) / 10000.0)"

  /** Round-half-up to 2 decimals (for sums of 2-decimal data). */
  def n2(e: String): String = s"(floor(($e) * 100 + 0.5) / 100.0)"
}
