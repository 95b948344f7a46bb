package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** T1/T2 — per-column logical type inference (reference:
  * ETL_PROJECT.py:16-41).
  *
  * The reference makes 2+ full passes per column; here ONE wide
  * aggregate over the whole table computes every per-column statistic
  * the detector (and the text-cleaner's whitespace gate) needs, then
  * the 5-way decision is plain Scala on the single collected row.
  *
  * Scale note: the exact `count(distinct c)` per column is required by
  * the reference's hard `< 50` / ratio cutoffs. Multiple distinct
  * aggregates in one pass cost an Expand (#cols × rows); at very large
  * scale call [[profile]] on `df.sample(...)` — the ratios are the
  * decision inputs and subsample well — keeping exact counts for the
  * correctness path.
  */
object TypeDetector {

  /** Everything the detector + cleaner gates need for one column. */
  final case class ColProfile(
      nonNull: Long,
      dateParses: Long,
      numericParses: Long,
      distinct: Long,
      avgRawLen: Double,
      /** mean length after trim+text-null-map: drives C2's collapse gate */
      avgTextCleanedLen: Double) {

    def dateRatio: Double    = if (nonNull == 0) 0 else dateParses.toDouble / nonNull
    def numericRatio: Double = if (nonNull == 0) 0 else numericParses.toDouble / nonNull
    def uniqueRatio: Double  = if (nonNull == 0) 0 else distinct.toDouble / nonNull
  }

  final case class TableProfile(totalRows: Long, cols: Map[String, ColProfile])

  /** `pd.to_numeric(errors='coerce').notna()` equivalence: Spark's
    * try_cast accepts "NaN" as a non-null NaN double while pandas'
    * NaN fails `notna()` — exclude it; pandas accepts "inf"/"infinity"
    * spellings (→ non-null inf) which try_cast spells differently —
    * include them. (SURVEY.md trap P8.)
    *
    * The `translate`-emptiness charset gate serves two purposes:
    * (1) perf — Spark's string→double cast throws-and-catches a
    * NumberFormatException per failed parse (profiled as the detection
    * hotspot on non-numeric columns); (2) parity — bare try_cast also
    * accepts Java-isms like "1.0d"/"1.0f" that pandas AND DuckDB both
    * reject, so gating on the decimal/scientific charset matches the
    * oracle more closely, not less.
    */
  def numericParses(s: Column): Column = {
    val d = s.try_cast(DoubleType)
    val charsOk = translate(s, " \t\n\r0123456789.eE+-", "") === ""
    when(charsOk, d.isNotNull && !isnan(d))
      .otherwise(lower(trim(s)).isin(
        "inf", "+inf", "-inf", "infinity", "+infinity", "-infinity"))
  }

  /** DuckDB rendering of [[numericParses]] for oracle SQL. */
  def duckdbNumericParses(expr: String): String =
    s"((try_cast($expr AS DOUBLE) IS NOT NULL AND NOT isnan(try_cast($expr AS DOUBLE)))" +
      s" OR lower(trim($expr)) IN ('inf','+inf','-inf','infinity','+infinity','-infinity'))"

  def dateParses(s: Column): Column = DateFormats.parseDate(s).isNotNull

  /** TWO aggregate passes computing every column's profile.
    *
    * Pass 1 — every cheap statistic (counts, parse flags, avg lengths)
    * in ONE flat aggregate: the parse flags and lengths are
    * materialized in a projection below the aggregate so the 16-format
    * date parse runs once per value, and with no distinct-aggregate in
    * the plan there is NO Expand — one codegen span, partial+final.
    *
    * Pass 2 — the exact distinct counts (required by the reference's
    * hard `< 50` / ratio cutoffs) via a map-explode: (column, value)
    * pairs, map-side-deduped by the partial aggregate, then counted per
    * column. N exact `count_distinct`s in pass 1 would compile to an
    * Expand replicating every projected column N+1 times through the
    * aggregate (measured 14.5 s of a 75 s bench at sf0.1); the explode
    * ships 2-column pairs instead and was measured ~5x cheaper. At very
    * large scale call [[profile]] on `df.sample(...)` — the ratios are
    * the decision inputs and subsample well.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): TableProfile = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val proj = df.select(cols.flatMap { name =>
      val s = col(name).cast(StringType)
      Seq(
        s.as(s"$name::s"),
        dateParses(s).as(s"$name::isdate"),
        numericParses(s).as(s"$name::isnum"),
        length(s).as(s"$name::len"),
        length(Cleaners.cleanText(s, collapseWhitespace = false)).as(s"$name::tlen"),
      )
    }: _*)
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { name =>
      Seq(
        count(col(s"$name::s")).as(s"$name::n"),
        count(when(col(s"$name::isdate"), 1)).as(s"$name::date"),
        count(when(col(s"$name::isnum"), 1)).as(s"$name::num"),
        avg(col(s"$name::len")).as(s"$name::len"),
        avg(col(s"$name::tlen")).as(s"$name::tlen"),
      )
    }
    val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
    val distinct = distinctCounts(df, cols)
    def l(f: String): Long = if (row.isNullAt(row.fieldIndex(f))) 0L else row.getLong(row.fieldIndex(f))
    def d(f: String): Double = if (row.isNullAt(row.fieldIndex(f))) 0.0 else row.getDouble(row.fieldIndex(f))
    TableProfile(
      l("__total"),
      cols.map { c =>
        c -> ColProfile(l(s"$c::n"), l(s"$c::date"), l(s"$c::num"),
          distinct.getOrElse(c, 0L), d(s"$c::len"), d(s"$c::tlen"))
      }.toMap)
  }

  /** Exact per-column distinct counts, Expand-free: posexplode to
    * (ordinal, value) pairs — nulls dropped like `count_distinct` —
    * dedup (map-side partials collapse in-partition duplicates before
    * the shuffle), count per ordinal. Array, not map: no per-row key
    * strings allocated.
    */
  private[etl] def distinctCounts(df: DataFrame, cols: Seq[String]): Map[String, Long] = {
    val pairs = df.select(
      posexplode(array(cols.map(c => col(c).cast(StringType)): _*))
        .as(Seq("__i", "__v")))
      .where(col("__v").isNotNull)
    pairs.distinct()
      .groupBy("__i").agg(count(lit(1)).as("__dist"))
      .collect()
      .map(r => cols(r.getInt(0)) -> r.getLong(1)).toMap
  }

  /** The 5-way decision, in the reference's exact rule order
    * (reference: ETL_PROJECT.py:18-41).
    *
    * `allowCategorical = false` re-runs the decision with the
    * Categorical rule disabled — used when sampled detection admitted
    * a column whose EXACT distinct count fails the hard `< 50` gate
    * (distinct counts don't subsample: a 1%-sample can miss the long
    * tail of a high-cardinality skewed column).
    */
  def decide(p: ColProfile, allowCategorical: Boolean = true): ColType =
    if (p.nonNull == 0) ColType.Unknown
    else if (p.dateRatio > 0.7) ColType.Date
    else if (p.numericRatio > 0.7) ColType.Numeric
    else if (allowCategorical && p.uniqueRatio > 0 && p.uniqueRatio <= 0.3 && p.distinct < 50)
      ColType.Categorical
    else if (p.avgRawLen > 10 && p.uniqueRatio > 0.5) ColType.Text
    else ColType.Unknown

  def detect(df: DataFrame): Map[String, ColType] =
    profile(df).cols.map { case (c, p) => c -> decide(p) }
}
