package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Classical dataset-profiling statistics the reference's `summarize`
  * stage stops short of (ETL_PROJECT.py:246-268 reports only
  * per-column min/mean/max): pairwise Pearson correlation, robust
  * MAD outlier gating, exponentially-weighted smoothing, and
  * equal-width histograms.
  *
  * Exactness discipline (the q66/q81 integer-grid trick): every
  * order-sensitive reduction is either an EXACT integer sum (values
  * pre-scaled to cents and summed in DECIMAL(38,0)/HUGEINT) or a
  * per-row integer-grid projection folded with an associative BIGINT
  * sum — so results are bit-identical across partition layouts AND
  * across engines, with doubles appearing only in per-row projections
  * and single final divisions.
  */
object StatsOps {

  /** `x` scaled to an exact integer cent grid (2 decimals). */
  private def centsU(c: Column): Column = floor(c * lit(100) + lit(0.5))
  private def centsUSql(e: String): String =
    s"CAST(floor($e * 100 + 0.5) AS BIGINT)"

  // ---- Pearson correlation matrix ---------------------------------------

  /** All-pairs Pearson correlation over `cols` in ONE scan.
    *
    * The five moments (n, Sx, Sy, Sxy, Sxx, Syy) are accumulated as
    * exact DECIMAL(38,0) sums of cent-scaled values (correlation is
    * scale-invariant, so the ×100 changes nothing), then
    * `corr = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²))`
    * is evaluated in doubles on the single moment row. Largest
    * intermediate ≈ n·Σx² ≈ 1e26 at sf0.1 — far inside DECIMAL(38).
    *
    * Scale shape: one partial-aggregable scan producing a 1-row
    * moment frame; k(k−1)/2 correlations are a driver-free projection
    * of that row. No second pass, no per-pair scans — at 100 TB this
    * is a single map-side-combined reduce.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val dec = DecimalType(38, 0)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val base = df.select(cols.map(c => centsU(col(c)).cast(dec).as(c)): _*)
    val moments: Seq[Column] =
      Seq(count(lit(1)).cast(dec).as("n")) ++
        cols.flatMap(c => Seq(
          sum(col(c)).as(s"s_$c"),
          sum(col(c) * col(c)).as(s"ss_$c"))) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    val m = base.agg(moments.head, moments.tail: _*)
    def corrOf(a: String, b: String): Column = {
      val num = (col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
        .cast(DoubleType)
      val da = (col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a"))
        .cast(DoubleType)
      val db = (col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
        .cast(DoubleType)
      // try_divide: a zero-variance column must yield NULL (DuckDB's
      // x/0 convention), not an ANSI DIVIDE_BY_ZERO error
      try_divide(num, sqrt(da) * sqrt(db))
    }
    m.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(s"${a}__$b").as("pair"), corrOf(a, b).as("corr"))
      }: _*)).as("p"))
      .select(col("p.pair").as("pair"), col("p.corr").as("corr"))
      .orderBy("pair")
  }

  /** [[corrMatrix]] oracle rendering (HUGEINT moments in DuckDB). */
  def corrMatrixSql(table: String, cols: Seq[String]): String = {
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val u = cols.map(c => s"${centsUSql(c)} AS $c").mkString(", ")
    val moments =
      (Seq("CAST(count(*) AS HUGEINT) AS n") ++
        cols.flatMap(c => Seq(s"sum($c) AS s_$c", s"sum($c * $c) AS ss_$c")) ++
        pairs.map { case (a, b) => s"sum($a * $b) AS sp_${a}_$b" }).mkString(",\n    ")
    val rows = pairs.map { case (a, b) =>
      val num = s"CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE)"
      val da = s"sqrt(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE))"
      val db = s"sqrt(CAST(n * ss_$b - s_$b * s_$b AS DOUBLE))"
      s"SELECT '${a}__$b' AS pair, $num / ($da * $db) AS corr FROM m"
    }.mkString("\n  UNION ALL ")
    s"""WITH u AS (SELECT $u FROM $table),
       |m AS (SELECT $moments FROM u)
       |SELECT pair, corr FROM (
       |  $rows)
       |ORDER BY pair""".stripMargin
  }

  // ---- MAD robust outlier gate ------------------------------------------

  /** Per-group robust outlier census: median, MAD (median absolute
    * deviation), and the count of rows beyond `nSigmas` robust sigmas
    * (MAD · 1.4826 ≈ σ for normal data — the robust alternative to
    * the reference's mean±3σ winsorize bounds, ETL_PROJECT.py:154-163,
    * which an outlier itself can drag).
    *
    * Medians are EXACT interpolating percentiles on the integer cent
    * grid (the q43 parity class: Spark `percentile` == DuckDB
    * `median` on BIGINT, both (a+b)/2 at even counts), so every
    * derived double is reproduced bit-for-bit by the oracle.
    *
    * Scale shape: two grouped exact-median passes plus one counting
    * pass, with the per-group medians (group-cardinality rows, tiny)
    * broadcast back — no row-level shuffle beyond the group key.
    */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      nSigmas: Double = 3.0): DataFrame = {
    val k = nSigmas * 1.4826
    val base = df.select(col(groupCol).as("grp"),
      centsU(col(valCol)).cast(LongType).as("x"))
    val med = base.groupBy("grp")
      .agg(element_at(percentile(col("x"), array(lit(0.5))), 1).as("med"))
    val withMed = base.join(broadcast(med), "grp")
    val mad = withMed.groupBy("grp")
      .agg(element_at(percentile(abs(col("x") - col("med")), array(lit(0.5))), 1)
        .as("mad"))
    withMed.join(broadcast(mad), "grp")
      .groupBy(col("grp"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("x") - col("med")) > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_out"))
      .select(col("grp"), col("n"), col("med"), col("mad"), col("n_out"))
      .orderBy("grp")
  }

  /** [[madOutliers]] oracle rendering. */
  def madOutliersSql(table: String, groupCol: String, valCol: String,
      nSigmas: Double = 3.0): String = {
    val k = nSigmas * 1.4826
    s"""WITH b AS (SELECT $groupCol AS grp, ${centsUSql(valCol)} AS x FROM $table),
       |med AS (SELECT grp, median(x) AS med FROM b GROUP BY 1),
       |mad AS (SELECT grp, median(abs(x - med)) AS mad
       |        FROM b JOIN med USING (grp) GROUP BY 1)
       |SELECT grp, count(*) AS n, med, mad,
       |  CAST(sum(CASE WHEN abs(x - med) > $k * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out
       |FROM b JOIN med USING (grp) JOIN mad USING (grp)
       |GROUP BY grp, med, mad ORDER BY grp""".stripMargin
  }

  // ---- exponentially-weighted moving average ----------------------------

  /** EWMA window depth and decay. Weights are materialized ONCE here
    * (driver-side) and injected as literal arrays into BOTH engines,
    * so no runtime `pow` (whose last-ulp behavior libm does not
    * guarantee) ever runs: w(k) = (1−α)^k for lag k, plus the
    * cumulative sums used to normalize short leading frames.
    */
  val EwmaAlpha = 0.3
  val EwmaDepth = 30
  val ewmaWeights: Seq[Double] =
    Iterator.iterate(1.0)(_ * (1.0 - EwmaAlpha)).take(EwmaDepth).toSeq
  val ewmaCumWeights: Seq[Double] = ewmaWeights.scanLeft(0.0)(_ + _).tail

  /** Daily-revenue EWMA (pandas `ewm(alpha).mean()` with
    * `adjust=True`, truncated to a 30-day history): smooth(t) =
    * Σ_k w(k)·rev(t−k) / Σ_k w(k) over the trailing frame.
    *
    * Revenue aggregates exactly on an integer 10⁻⁴-dollar grid
    * (cents × (100−disc_pct)); each weighted term is floored to an
    * integer BEFORE the frame sum, so the fold is associative and
    * the single final division is the only double op that survives.
    *
    * Scale shape: the row-level work is one partial-aggregable
    * groupBy(day); the window then runs on the DAY GRAIN — ≤ a few
    * thousand rows a decade regardless of corpus size — so the
    * unpartitioned 30-row sliding frame is bounded by the calendar,
    * not the data (same argument as q39's moving average).
    */
  def ewmaDaily(lineitem: DataFrame): DataFrame = {
    val revU = centsU(col("l_extendedprice")).cast(LongType) *
      (lit(100L) - centsU(col("l_discount")).cast(LongType))
    val daily = lineitem
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(revU).as("rev_u"))
    val wArr = array(ewmaWeights.map(lit): _*)
    val cumArr = array(ewmaCumWeights.map(lit): _*)
    val frame = Window.orderBy("day").rowsBetween(-(EwmaDepth - 1), 0)
    val lst = collect_list(col("rev_u")).over(frame)
    // transform's i is 0-based; lag of element i is size-1-i, so its
    // weight lives at 1-based index size-i.
    val terms = transform(lst,
      (v, i) => floor(v.cast(DoubleType) * element_at(wArr, size(lst) - i) + lit(0.5)))
    val termSum = aggregate(terms, lit(0L), (acc, x) => acc + x)
    val ewmaU = floor(termSum.cast(DoubleType) / element_at(cumArr, size(lst)) + lit(0.5))
      .as("ewma_u")
    daily.select(col("day"), col("rev_u"), ewmaU).orderBy("day")
  }

  /** [[ewmaDaily]] oracle rendering: the same integer-grid terms via
    * a rank self-join (`b.rn ∈ [a.rn−29, a.rn]`, weight index
    * `a.rn − b.rn + 1`) — HUGEINT-summed, one final division.
    */
  def ewmaDailySql(table: String): String = {
    def arr(xs: Seq[Double]): String = xs.mkString("[", ", ", "]")
    val revU = s"${centsUSql("l_extendedprice")} * (100 - ${centsUSql("l_discount")})"
    s"""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
       |    CAST(sum($revU) AS BIGINT) AS rev_u
       |  FROM $table GROUP BY 1),
       |rn AS (SELECT day, rev_u, row_number() OVER (ORDER BY day) AS rn FROM daily)
       |SELECT a.day, a.rev_u,
       |  CAST(floor(CAST(sum(CAST(floor(CAST(b.rev_u AS DOUBLE)
       |      * (${arr(ewmaWeights)})[a.rn - b.rn + 1] + 0.5) AS BIGINT)) AS DOUBLE)
       |    / (${arr(ewmaCumWeights)})[least(a.rn, $EwmaDepth)] + 0.5) AS BIGINT) AS ewma_u
       |FROM rn a JOIN rn b ON b.rn BETWEEN a.rn - ${EwmaDepth - 1} AND a.rn
       |GROUP BY a.day, a.rev_u, a.rn
       |ORDER BY a.day""".stripMargin
  }

  // ---- equal-width histogram --------------------------------------------

  /** Equal-width `bins`-bucket histogram over the cent grid:
    * bin = min(⌊(x−min)·bins / (max−min)⌋, bins−1), ALL in integer
    * arithmetic (`div`) — a double quotient could round up across a
    * bin edge and disagree between engines. The max value folds into
    * the last bin (width_bucket convention).
    *
    * Scale shape: one min/max scan reduced to a single broadcast row,
    * then one partial-aggregable bucket count — two passes total, both
    * map-side combined.
    */
  def histogram(df: DataFrame, valCol: String, bins: Int = 20): DataFrame = {
    val u = df.select(centsU(col(valCol)).cast(LongType).as("x"))
    val mm = u.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    u.crossJoin(broadcast(mm))
      .select(when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(expr(s"((x - mn) * $bins) div (mx - mn)"), lit(bins - 1L)))
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
      .orderBy("bin")
  }

  /** [[histogram]] oracle rendering (`//` = DuckDB integer div). */
  def histogramSql(table: String, valCol: String, bins: Int = 20): String =
    s"""WITH u AS (SELECT ${centsUSql(valCol)} AS x FROM $table),
       |mm AS (SELECT min(x) AS mn, max(x) AS mx FROM u)
       |SELECT CASE WHEN mx = mn THEN 0
       |            ELSE least(((x - mn) * $bins) // (mx - mn), ${bins - 1}) END AS bin,
       |  count(*) AS cnt
       |FROM u CROSS JOIN mm
       |GROUP BY 1 ORDER BY bin""".stripMargin
}
