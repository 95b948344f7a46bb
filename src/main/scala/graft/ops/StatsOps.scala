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

  /** The 100 TB scale path for [[madOutliers]] (VERDICT r10 #2):
    * grouped medians and MADs from `percentile_approx` (the GK/KLL
    * sketch — mergeable, bounded memory, no full sort), GATED against
    * the exact interpolated percentiles computed in the same pass.
    * Output per group: the exact census columns (oracle-checkable)
    * plus three booleans asserting the sketch landed inside its
    * documented tolerance — `med_ok`/`mad_ok` within 1% of exact,
    * and the downstream outlier count within max(5%, ±8 rows) of the
    * exact census (the count is a cliff function of the cut, so a
    * small absolute slack keeps tiny groups meaningful). The oracle
    * emits TRUE for the booleans, so a sketch drifting out of
    * tolerance at any SF fails the driver hash gate.
    *
    * At 100 TB the exact side of this query is dropped and only the
    * sketch runs (`EtlConfig.approxPercentiles`, the q64 switch);
    * this gate exists to keep that switch honest.
    */
  def madOutliersApprox(df: DataFrame, groupCol: String, valCol: String,
      nSigmas: Double = 3.0, accuracy: Int = 10000): DataFrame = {
    val k = nSigmas * 1.4826
    val base = df.select(col(groupCol).as("grp"),
      centsU(col(valCol)).cast(LongType).as("x"))
    val med = base.groupBy("grp")
      .agg(element_at(percentile(col("x"), array(lit(0.5))), 1).as("med"),
        percentile_approx(col("x"), lit(0.5), lit(accuracy)).as("amed"))
    val withMed = base.join(broadcast(med), "grp")
    val mad = withMed.groupBy("grp")
      .agg(element_at(percentile(abs(col("x") - col("med")), array(lit(0.5))), 1)
        .as("mad"),
        percentile_approx(abs(col("x") - col("med")), lit(0.5), lit(accuracy))
          .as("amad"))
    withMed.join(broadcast(mad), "grp")
      .groupBy(col("grp"), col("med"), col("amed"), col("mad"), col("amad"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("x") - col("med")) > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_out"),
        sum(when(abs(col("x") - col("amed")) > lit(k) * col("amad"), 1L)
          .otherwise(0L)).as("n_out_a"))
      .select(col("grp"), col("n"), col("med"), col("mad"), col("n_out"),
        // tolerances on |exact|: a negative group median would
        // otherwise yield a negative tolerance band that rejects an
        // EXACT sketch (ADVICE r11 — spurious gate failure, not a
        // wrong answer; mad is nonnegative by construction but gets
        // the same guard for uniformity)
        (abs(col("amed") - col("med")) <= lit(0.01) * abs(col("med")))
          .as("med_ok"),
        (abs(col("amad") - col("mad")) <= lit(0.01) * abs(col("mad")))
          .as("mad_ok"),
        (abs(col("n_out_a") - col("n_out")).cast(DoubleType) <=
          greatest(lit(0.05) * col("n_out"), lit(8.0))).as("nout_ok"))
      .orderBy("grp")
  }

  /** [[madOutliersApprox]] oracle rendering: the exact census columns
    * recomputed in DuckDB, the sketch gates as TRUE literals.
    */
  def madOutliersApproxSql(table: String, groupCol: String, valCol: String,
      nSigmas: Double = 3.0): String = {
    val k = nSigmas * 1.4826
    s"""WITH b AS (SELECT $groupCol AS grp, ${centsUSql(valCol)} AS x FROM $table),
       |med AS (SELECT grp, median(x) AS med FROM b GROUP BY 1),
       |mad AS (SELECT grp, median(abs(x - med)) AS mad
       |        FROM b JOIN med USING (grp) GROUP BY 1)
       |SELECT grp, count(*) AS n, med, mad,
       |  CAST(sum(CASE WHEN abs(x - med) > $k * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
       |  TRUE AS med_ok, TRUE AS mad_ok, TRUE AS nout_ok
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

  // ---- per-group OLS regression -----------------------------------------

  /** Per-group simple linear regression y ~ x with the [[corrMatrix]]
    * exact-moment machinery: DECIMAL(38,0) cent-grid sums, then
    * slope = (n·Sxy − SxSy)/(n·Sxx − Sx²),
    * intercept = (Sy − slope·Sx)/n (cent units),
    * r² = num²/(dx·dy) — evaluated in doubles on the per-group moment
    * row in a single fixed expression order, so both engines emit the
    * same bits. Zero x-variance groups yield NULL slope/r² (the x/0
    * convention). Returns (grp, n, slope, intercept, r2).
    *
    * Scale shape: ONE partial-aggregable grouped scan; the regression
    * algebra is a projection of the tiny moment frame.
    */
  def olsByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val m = df.select(col(groupCol).as("grp"),
        centsU(col(xCol)).cast(dec).as("x"), centsU(col(yCol)).cast(dec).as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        count(lit(1)).cast(dec).as("nd"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val num = (col("nd") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
    val dx = (col("nd") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
    val dy = (col("nd") * col("syy") - col("sy") * col("sy")).cast(DoubleType)
    val slope = try_divide(num, dx)
    m.select(col("grp"), col("n"),
        slope.as("slope"),
        ((col("sy").cast(DoubleType) - slope * col("sx").cast(DoubleType))
          / col("nd").cast(DoubleType)).as("intercept"),
        try_divide(num * num, dx * dy).as("r2"))
      .orderBy("grp")
  }

  /** [[olsByGroup]] oracle rendering. */
  def olsByGroupSql(table: String, groupCol: String, xCol: String,
      yCol: String): String = {
    val num = "CAST(nd * sxy - sx * sy AS DOUBLE)"
    val dx = "CAST(nd * sxx - sx * sx AS DOUBLE)"
    val dy = "CAST(nd * syy - sy * sy AS DOUBLE)"
    s"""WITH b AS (SELECT $groupCol AS grp, ${centsUSql(xCol)} AS x,
       |    ${centsUSql(yCol)} AS y FROM $table),
       |m AS (SELECT grp, count(*) AS n, CAST(count(*) AS HUGEINT) AS nd,
       |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
       |    sum(y * y) AS syy, sum(x * y) AS sxy
       |  FROM b GROUP BY 1)
       |SELECT grp, n, $num / $dx AS slope,
       |  (CAST(sy AS DOUBLE) - ($num / $dx) * CAST(sx AS DOUBLE))
       |    / CAST(nd AS DOUBLE) AS intercept,
       |  ($num * $num) / ($dx * $dy) AS r2
       |FROM m ORDER BY grp""".stripMargin
  }

  // ---- Gini concentration index -----------------------------------------

  /** Gini coefficient of `valCol` mass concentration across `keyCol`
    * (revenue-per-customer inequality — the "how head-heavy is this
    * corpus/market" statistic):
    * `G = (2·Σᵢ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)` over ascending-sorted
    * per-key exact cent totals. Tied totals contribute identically
    * under any permutation of their ranks, so the (x, key) sort is
    * fully deterministic. All moments are exact DECIMAL sums; the
    * single final division is the only double op. Returns one row
    * (n_keys, total_u, gini).
    *
    * Scale shape: one partial-aggregable per-key sum, then ranks from
    * the BUCKETED global-rank machinery (q166 — sketch cuts + an
    * offset carry frame + bucket-local windows), so the key-domain
    * frame never collapses onto one partition the way a bare
    * `row_number() OVER (ORDER BY …)` would (round-12 fix; the rank
    * total order — (x, k) ascending — and therefore the result is
    * unchanged), one 1-row fold.
    */
  def gini(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val perKey = df.groupBy(col(keyCol).as("k"))
      .agg(sum(centsU(col(valCol)).cast(LongType)).as("x"))
    val ranked = graft.ops.LayoutOps.globalRank(perKey, "x", "k")
      .withColumn("i", col("rank").cast(dec))
    ranked
      .agg(count(lit(1)).as("n_keys"),
        count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("s0x"),
        sum(col("x").cast(dec) * col("i")).as("s1"))
      .select(col("n_keys"), col("s0x").cast(LongType).as("total_u"),
        try_divide(
          (lit(2).cast(dec) * col("s1") - (col("n") + lit(1).cast(dec)) * col("s0x"))
            .cast(DoubleType),
          (col("n") * col("s0x")).cast(DoubleType)).as("gini"))
  }

  /** [[gini]] oracle rendering. */
  def giniSql(table: String, keyCol: String, valCol: String): String =
    s"""WITH perkey AS (SELECT $keyCol AS k,
       |    CAST(sum(${centsUSql(valCol)}) AS BIGINT) AS x
       |  FROM $table GROUP BY 1),
       |ranked AS (SELECT x, CAST(row_number() OVER (ORDER BY x, k) AS HUGEINT) AS i
       |  FROM perkey),
       |m AS (SELECT count(*) AS n_keys, CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(x) AS HUGEINT) AS s0x, sum(x * i) AS s1
       |  FROM ranked)
       |SELECT n_keys, CAST(s0x AS BIGINT) AS total_u,
       |  CAST(2 * s1 - (n + 1) * s0x AS DOUBLE)
       |    / CAST(n * s0x AS DOUBLE) AS gini
       |FROM m""".stripMargin

  // ---- rolling window quantile ------------------------------------------

  /** Trailing `days`-row exact P95 of the daily revenue series — the
    * robust alerting band a moving average ([[ewmaDaily]]) can't give
    * you. Revenue totals are exact integers; the windowed percentile
    * is the q43 parity class (Spark `percentile` == DuckDB
    * `quantile_cont`), n4-normalized like every interpolated
    * percentile in this suite. Returns (day, rev_u, p95).
    *
    * Scale shape: same day-grain argument as [[ewmaDaily]] — the
    * window input is calendar-bounded, not data-bounded.
    */
  def rollingP95Daily(lineitem: DataFrame, days: Int = 7): DataFrame = {
    val revU = centsU(col("l_extendedprice")).cast(LongType) *
      (lit(100L) - centsU(col("l_discount")).cast(LongType))
    val daily = lineitem
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(revU).as("rev_u"))
    val frame = Window.orderBy("day").rowsBetween(-(days - 1), 0)
    daily.select(col("day"), col("rev_u"),
        graft.queries.Norm.n4(element_at(
          percentile(col("rev_u"), array(lit(0.95))).over(frame), 1)).as("p95"))
      .orderBy("day")
  }

  /** [[rollingP95Daily]] oracle rendering (rank self-join — the
    * engine-portable windowed-quantile formulation).
    */
  def rollingP95DailySql(table: String, days: Int = 7): String = {
    val revU = s"${centsUSql("l_extendedprice")} * (100 - ${centsUSql("l_discount")})"
    s"""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
       |    CAST(sum($revU) AS BIGINT) AS rev_u
       |  FROM $table GROUP BY 1),
       |rn AS (SELECT day, rev_u, row_number() OVER (ORDER BY day) AS rn FROM daily)
       |SELECT a.day, a.rev_u,
       |  ${graft.etl.OracleSql.n4("quantile_cont(b.rev_u, 0.95)")} AS p95
       |FROM rn a JOIN rn b ON b.rn BETWEEN a.rn - ${days - 1} AND a.rn
       |GROUP BY a.day, a.rev_u
       |ORDER BY a.day""".stripMargin
  }

  // ---- Kaplan-Meier survival ---------------------------------------------

  /** Kaplan-Meier survival over (time, event) observations — the
    * time-to-event curve (order→fulfilment latency, user churn) with
    * right-censoring. Per distinct time t: d(t) events, c(t)
    * censorings, risk set n(t) = N − Σ_{s<t}(d+c), and the cumulative
    * LOG-survival `logS(t) = Σ_{s≤t, d(s)>0} ln((n−d)/n)` folded on
    * the q81 micro-grid — the product chain becomes an associative
    * integer sum, so the curve is bit-identical across layouts and
    * engines (S(t) = exp(logs_u/10⁶) when a probability is needed).
    * Risk-set extinction (d = n, S hits exactly 0, ln 0 = −∞) is
    * represented as NULL logs_u from that time onward — the one
    * survival value the log grid cannot carry. Returns
    * (t, n_risk, d, c, logs_u) ordered by t.
    *
    * Scale shape: one partial-aggregable (time)-keyed count, then an
    * ordered window over DISTINCT times (the time domain, not the row
    * count). Subjects never shuffle twice.
    */
  def kaplanMeier(df: DataFrame, timeCol: String, eventCol: String): DataFrame = {
    val g = df.select(col(timeCol).as("t"), col(eventCol).cast("boolean").as("e"))
      .groupBy("t").agg(
        sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        sum(when(!col("e"), 1L).otherwise(0L)).as("c"))
      .withColumn("dc", col("d") + col("c"))
    // both prefix passes ride the bucketed census machinery (round 16,
    // the q112/q122 rework): on a CONTINUOUS time column the distinct-
    // time domain approaches the subject count and an unpartitioned
    // Window.orderBy("t") would sort it on one task. The exclusive
    // prefix for the risk set is the inclusive one minus the row's own
    // mass (associative sums, exact)
    val cum1 = graft.ops.LayoutOps.censusCum(g, "t", Seq("dc"),
      inclusive = true)
    val nTot = cum1.agg(sum(col("dc")).as("n_tot"))
    val withRisk = cum1.crossJoin(broadcast(nTot))
      .withColumn("n_risk",
        col("n_tot") - (col("__cum_dc") - col("dc")))
    val term = when(col("d") > 0 && col("d") < col("n_risk"),
      floor(log((col("n_risk") - col("d")).cast(DoubleType) /
        col("n_risk").cast(DoubleType)) * lit(1000000.0) + lit(0.5)).cast(LongType))
      .otherwise(lit(0L))
    val extinct = when(col("d") === col("n_risk"), 1L).otherwise(0L)
    val cum2 = graft.ops.LayoutOps.censusCum(
      withRisk.withColumn("term", term).withColumn("ext", extinct),
      "t", Seq("term", "ext"), inclusive = true)
    cum2
      .withColumn("logs_u",
        when(col("__cum_ext") > 0, lit(null))
          .otherwise(col("__cum_term")))
      .select(col("t"), col("n_risk"), col("d"), col("c"), col("logs_u"))
      .orderBy("t")
  }

  /** [[kaplanMeier]] oracle rendering. */
  def kaplanMeierSql(table: String, timeSql: String, eventSql: String): String =
    s"""WITH g AS (SELECT $timeSql AS t,
       |    CAST(sum(CASE WHEN $eventSql THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |    CAST(sum(CASE WHEN NOT ($eventSql) THEN 1 ELSE 0 END) AS BIGINT) AS c
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_tot FROM g),
       |risk AS (SELECT t, d, c,
       |    n_tot - CAST(coalesce(sum(d + c) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
       |  FROM g CROSS JOIN tot),
       |terms AS (SELECT t, n_risk, d, c,
       |    CASE WHEN d > 0 AND d < n_risk
       |         THEN CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
       |           / CAST(n_risk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
       |         ELSE 0 END AS term,
       |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS ext
       |  FROM risk)
       |SELECT t, n_risk, d, c,
       |  CASE WHEN sum(ext) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) > 0
       |       THEN NULL
       |       ELSE CAST(sum(term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |  END AS logs_u
       |FROM terms ORDER BY t""".stripMargin

  // ---- day-of-week seasonality ------------------------------------------

  /** Day-of-week seasonality index: mean daily revenue on ISO weekday
    * d divided by the overall mean daily revenue, as the exact-
    * integer cross product `(Σrev_d · n_days) / (n_days_d · Σrev)` —
    * one division of two exact DECIMAL products. Returns
    * (dow, n_days, rev_u, idx) for ISO weekdays 1-7.
    */
  def dowSeasonality(lineitem: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val revU = centsU(col("l_extendedprice")).cast(LongType) *
      (lit(100L) - centsU(col("l_discount")).cast(LongType))
    val daily = lineitem
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(revU).as("rev_u"))
    val tot = daily.agg(count(lit(1)).cast(dec).as("nt"),
      sum(col("rev_u")).cast(dec).as("st"))
    daily.select((weekday(col("day")) + 1).as("dow"), col("rev_u"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        count(lit(1)).cast(dec).as("nd"),
        sum(col("rev_u")).as("rev_u"))
      .crossJoin(broadcast(tot))
      // BIGINT dow like DuckDB's isodow (weekday+1 is INT in Spark)
      .select(col("dow").cast(LongType).as("dow"), col("n_days"),
        col("rev_u"),
        try_divide((col("rev_u").cast(dec) * col("nt")).cast(DoubleType),
          (col("nd") * col("st")).cast(DoubleType)).as("idx"))
      .orderBy("dow")
  }

  /** [[dowSeasonality]] oracle rendering (`isodow` = Spark weekday+1). */
  def dowSeasonalitySql(table: String): String = {
    val revU = s"${centsUSql("l_extendedprice")} * (100 - ${centsUSql("l_discount")})"
    s"""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS day,
       |    CAST(sum($revU) AS BIGINT) AS rev_u
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS HUGEINT) AS nt,
       |    CAST(sum(rev_u) AS HUGEINT) AS st FROM daily),
       |dw AS (SELECT isodow(day) AS dow, count(*) AS n_days,
       |    CAST(count(*) AS HUGEINT) AS nd,
       |    CAST(sum(rev_u) AS BIGINT) AS rev_u
       |  FROM daily GROUP BY 1)
       |SELECT dow, n_days, rev_u,
       |  CAST(CAST(rev_u AS HUGEINT) * nt AS DOUBLE)
       |    / CAST(nd * st AS DOUBLE) AS idx
       |FROM dw CROSS JOIN tot ORDER BY dow""".stripMargin
  }

  // ---- temporal densification + forward fill ------------------------------

  /** Gap-fill to a dense per-key daily grid with forward fill — the
    * pandas `resample('D').ffill()` of a 100 TB warehouse: per
    * customer, every calendar day in [from, to] gets a row with that
    * day's order count (0-filled), the cumulative floored revenue,
    * and the LAST OBSERVED single-day revenue carried forward (NULL
    * until the key's first order — real forward-fill semantics, not
    * zero-fill). Keys = customers with ≥ 1 order in the window.
    *
    * Scale shape: the dense grid is a per-key `sequence` GENERATOR
    * (no shuffle — |keys|·days rows built map-side), one hash join
    * back to the sparse dailies on (key, day), one key-partitioned
    * window. The grid is calendar-bounded, so its size is
    * |keys|·days regardless of the fact table's row count.
    */
  def gapFillDaily(orders: DataFrame, from: String, to: String): DataFrame = {
    // localCheckpoint: the sparse daily frame feeds both the key-grid
    // generator and the join back; without it the two differently-
    // pruned lineages each rerun the orders scan + groupBy. The frame
    // is calendar-bounded (keys x active days), so materializing it
    // is cheap at any input scale.
    val daily = orders
      .where(to_date(col("o_orderdate")).between(lit(from), lit(to)))
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice")).cast(LongType)).as("rev"))
      .localCheckpoint(true)
    val grid = daily.select("o_custkey").distinct()
      .select(col("o_custkey"), explode(expr(
        s"sequence(to_date('$from'), to_date('$to'), interval 1 day)")).as("day"))
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("o_custkey", "day"), "left")
      .select(col("o_custkey"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        coalesce(sum(coalesce(col("rev"), lit(0L))).over(w), lit(0L)).as("rev_cum"),
        last(col("rev"), ignoreNulls = true).over(w).as("rev_ffill"))
      .orderBy("o_custkey", "day")
  }

  // ---- PSI distribution drift --------------------------------------------

  /** Population stability index between a reference and a current
    * slice of `valueCol` — the binned drift audit an ingest monitor
    * actually pages on (KS, q122, is its unbinned sibling):
    * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i), with the conventional
    * ≥1-count clamp on each bin (a bin EMPTY on one side is the
    * strongest drift signal and must contribute a finite, large term,
    * not ±∞; totals stay unclamped). Bins are `bins` fixed-width
    * cells over the pooled [min, max] of BOTH slices, joined onto a
    * dense 0..bins-1 spine (the q137 lesson: missing groups carry
    * the signal). Each term is floored onto the 1e-6 grid BEFORE the
    * sum (ln is last-ulp engine-private — the q116 convention), so
    * `psi_u` is exact micro-units. Degenerate pooled min==max puts
    * everything in bin 0 (width clamps to 1).
    *
    * Scale shape: one stats pass for the pooled bounds (1-row
    * broadcast back, q109's histogram layout), then ONE scan
    * aggregating both slices' bin counts map-side (conditional sums,
    * `bins` groups); everything after is arithmetic on `bins` rows.
    * Returns (bin, n_ref, n_cur, term_u, psi_u) ordered by bin.
    */
  def psiDrift(df: DataFrame, valueCol: Column, refPred: Column,
      curPred: Column, bins: Int): DataFrame = {
    require(bins > 1, s"bins must be > 1: $bins")
    val pool = df.where(refPred || curPred)
    val bounds = pool.agg(min(valueCol).as("__mn"), max(valueCol).as("__mx"))
    val width = when(col("__mx") > col("__mn"),
      (col("__mx") - col("__mn")) / lit(bins.toDouble)).otherwise(lit(1.0))
    val bin = least(floor((valueCol - col("__mn")) / width).cast(LongType),
      lit(bins - 1L))
    val counts = pool.crossJoin(broadcast(bounds))
      .groupBy(bin.as("bin"))
      .agg(sum(when(refPred, 1L).otherwise(0L)).as("__r"),
        sum(when(curPred, 1L).otherwise(0L)).as("__c"))
    val spine = df.sparkSession.range(0, bins).select(col("id").as("bin"))
    val dense = spine.join(broadcast(counts), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__r"), lit(0L)).as("n_ref"),
        coalesce(col("__c"), lit(0L)).as("n_cur"))
    val tot = dense.agg(sum(col("n_ref")).as("__nr"), sum(col("n_cur")).as("__nc"))
    val withTerm = dense.crossJoin(broadcast(tot))
      // an entirely-empty slice → empty result (not an ANSI div-0
      // error): drift vs nothing is not a defined statistic
      .where(col("__nr") > 0 && col("__nc") > 0)
      .withColumn("__p", greatest(col("n_ref"), lit(1L)).cast(DoubleType) /
        col("__nr").cast(DoubleType))
      .withColumn("__q", greatest(col("n_cur"), lit(1L)).cast(DoubleType) /
        col("__nc").cast(DoubleType))
      .withColumn("term_u",
        floor((col("__p") - col("__q")) * log(col("__p") / col("__q"))
          * lit(1e6) + lit(0.5)).cast(LongType))
    val psi = withTerm.agg(sum(col("term_u")).as("__psi"))
    withTerm.crossJoin(broadcast(psi))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("term_u"),
        col("__psi").as("psi_u"))
      .orderBy("bin")
  }

  /** [[psiDrift]] oracle rendering. `refSql`/`curSql` are boolean
    * predicates over the table's columns; prepend extra CTEs via
    * `extraCtes` (margin-free, per the stripMargin embedding rule).
    */
  def psiDriftSql(table: String, valueSql: String, refSql: String,
      curSql: String, bins: Int, extraCtes: String = ""): String = {
    val pre = if (extraCtes.isEmpty) "" else extraCtes + ",\n"
    s"""WITH ${pre}__pool AS (SELECT * FROM $table WHERE ($refSql) OR ($curSql)),
       |__bounds AS (SELECT min($valueSql) AS mn, max($valueSql) AS mx FROM __pool),
       |__w AS (SELECT mn, mx, CASE WHEN mx > mn
       |    THEN (mx - mn) / CAST($bins AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END AS w
       |  FROM __bounds),
       |__cnt AS (SELECT least(CAST(floor(($valueSql - mn) / w) AS BIGINT),
       |      ${bins - 1}) AS bin,
       |    CAST(sum(CASE WHEN $refSql THEN 1 ELSE 0 END) AS BIGINT) AS r,
       |    CAST(sum(CASE WHEN $curSql THEN 1 ELSE 0 END) AS BIGINT) AS c
       |  FROM __pool, __w GROUP BY 1),
       |__dense AS (SELECT s.bin, CAST(coalesce(c.r, 0) AS BIGINT) AS n_ref,
       |    CAST(coalesce(c.c, 0) AS BIGINT) AS n_cur
       |  FROM (SELECT CAST(gs AS BIGINT) AS bin
       |        FROM generate_series(0, ${bins - 1}) t(gs)) s
       |  LEFT JOIN __cnt c ON s.bin = c.bin),
       |__tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS nr,
       |    CAST(sum(n_cur) AS BIGINT) AS nc FROM __dense),
       |__t AS (SELECT bin, n_ref, n_cur,
       |    CAST(floor((CAST(greatest(n_ref, 1) AS DOUBLE) / nr
       |        - CAST(greatest(n_cur, 1) AS DOUBLE) / nc)
       |      * ln((CAST(greatest(n_ref, 1) AS DOUBLE) / nr)
       |        / (CAST(greatest(n_cur, 1) AS DOUBLE) / nc))
       |      * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS term_u
       |  FROM __dense, __tot WHERE nr > 0 AND nc > 0),
       |__s AS (SELECT CAST(sum(term_u) AS BIGINT) AS psi_u FROM __t)
       |SELECT bin, n_ref, n_cur, term_u, psi_u FROM __t, __s ORDER BY bin""".stripMargin
  }

  // ---- Benford first-digit audit -----------------------------------------

  /** log10(1 + 1/d) for d = 1..9, as shortest-round-trip decimal
    * strings: parsed into EXACTLY the same doubles by Scala and by
    * DuckDB (`CAST('…' AS DOUBLE)` — a bare decimal literal would be
    * DECIMAL and round differently), so the χ² chain is bit-identical.
    */
  private val benfordP: Seq[String] = Seq(
    "0.3010299956639812", "0.17609125905568124", "0.12493873660829993",
    "0.09691001300805642", "0.07918124604762482", "0.06694678963061322",
    "0.05799194697768673", "0.05115252244738129", "0.04575749056067514")

  /** Benford first-digit audit of a numeric column — the classic
    * fabricated-data / wrong-unit red flag: observed counts per
    * leading digit vs the Benford expectation n·log10(1+1/d), plus
    * the χ² statistic over all nine digits (repeated per row — the
    * engine's 1-row-broadcast convention, never a global window).
    * Rows with value < 1 are excluded — their integer part has no
    * leading digit in 1..9 (digit 0 would index past the Benford
    * table; auditing a sub-1 rate column means scaling it first).
    * Each digit's χ² contribution is floored onto the 1e-6 grid
    * BEFORE the 9-term sum (the PMI/q116 convention — a double sum's
    * order is engine-private; the integer sum is associative), so
    * `chi2_u` is exact micro-units. Returns
    * (digit, n_obs, exp_n4, chi2_u) ordered by digit.
    *
    * The counts are left-joined onto a dense 1..9 digit spine
    * (n_obs coalesced to 0): a digit that NEVER appears is the
    * most-anomalous case and must still contribute (0-exp)²/exp =
    * exp to χ² — grouping observed digits only would silently
    * understate the statistic exactly there. Empty input (no value
    * ≥ 1) yields an empty result, not nine 0/0 rows.
    *
    * Scale shape: ONE partial-aggregable ≤9-group count over one
    * scan; everything after is arithmetic on a 9-row frame.
    */
  def benfordCheck(df: DataFrame, valueCol: Column): DataFrame = {
    val digit = substring(floor(valueCol).cast(LongType).cast("string"), 1, 1)
      .cast("int")
    val counts = df.where(valueCol >= 1)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("__c"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val g = spine.join(broadcast(counts), Seq("digit"), "left")
      .select(col("digit"), coalesce(col("__c"), lit(0L)).as("n_obs"))
    val tot = g.agg(sum(col("n_obs")).as("__n"))
    val pArr = array(benfordP.map(s => lit(s.toDouble)): _*)
    val withExp = g.crossJoin(broadcast(tot))
      .withColumn("__exp",
        col("__n").cast(DoubleType) * element_at(pArr, col("digit")))
      .withColumn("__contrib_u",
        floor((col("n_obs").cast(DoubleType) - col("__exp")) *
          (col("n_obs").cast(DoubleType) - col("__exp")) / col("__exp") *
          lit(1e6) + lit(0.5)).cast(LongType))
    val chi = withExp.agg(sum(col("__contrib_u")).as("__chi2_u"))
    withExp.crossJoin(broadcast(chi))
      .where(col("__n") > 0) // empty input → empty result, not 0/0 rows
      .select(col("digit"), col("n_obs"),
        graft.queries.Norm.n4(col("__exp")).as("exp_n4"),
        col("__chi2_u").as("chi2_u"))
      .orderBy("digit")
  }

  /** [[benfordCheck]] oracle rendering. */
  def benfordCheckSql(table: String, valueSql: String): String = {
    val n4 = graft.etl.OracleSql.n4 _
    val pCase = benfordP.zipWithIndex.map { case (p, i) =>
      s"WHEN ${i + 1} THEN CAST('$p' AS DOUBLE)" }.mkString(" ")
    s"""WITH __c0 AS (SELECT CAST(substr(CAST(CAST(floor($valueSql) AS BIGINT)
       |      AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    count(*) AS c
       |  FROM $table WHERE $valueSql >= 1 GROUP BY 1),
       |__g AS (SELECT s.digit, CAST(coalesce(c.c, 0) AS BIGINT) AS n_obs
       |  FROM (SELECT CAST(gs AS INTEGER) AS digit
       |        FROM generate_series(1, 9) t(gs)) s
       |  LEFT JOIN __c0 c ON s.digit = c.digit),
       |__t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM __g),
       |__e AS (SELECT digit, n_obs,
       |    CAST(n AS DOUBLE) * (CASE digit $pCase END) AS expv
       |  FROM __g, __t WHERE n > 0),
       |__c AS (SELECT digit, n_obs, expv,
       |    CAST(floor((CAST(n_obs AS DOUBLE) - expv) * (CAST(n_obs AS DOUBLE) - expv)
       |      / expv * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS contrib_u
       |  FROM __e),
       |__x AS (SELECT CAST(sum(contrib_u) AS BIGINT) AS chi2_u FROM __c)
       |SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
       |  ${n4("expv")} AS exp_n4, chi2_u
       |FROM __c, __x ORDER BY digit""".stripMargin
  }

  // ---- t-closeness audit -------------------------------------------------

  /** t-closeness audit: for each quasi-identifier group, the total
    * variation distance between the group's SENSITIVE-attribute
    * distribution and the corpus-wide one —
    * `t = ½ Σ_s |n_gs/n_g − N_s/N|` (equal-ground-distance EMD for a
    * categorical attribute). Completes the privacy ladder:
    * k-anonymity (q131) sees group SIZE, l-diversity (q142) sees
    * sensitive CARDINALITY, t-closeness sees sensitive SKEW — a large
    * group with 5 distinct sources can still leak if 99% of it is one
    * source.
    *
    * Exactness: `t = Σ_s |n_gs·N − N_s·n_g| / (2·n_g·N)` — the
    * numerator is exact BIGINT. Sources ABSENT from a group still
    * contribute `N_s·n_g` each; rather than densifying on a
    * group×source spine, that tail is closed-form:
    * `Σ_{s∉g} N_s = N − Σ_{s∈g} N_s`, so the absent-source
    * contribution is `n_g·(N − Σ_{s∈g} N_s)` — no spine, no zero-row
    * bookkeeping (the Benford dense-spine lesson, solved
    * algebraically this time).
    *
    * Scale shape: one partial-aggregable (group, sensitive) count,
    * one broadcast join of the tiny per-sensitive totals, one
    * partial-aggregable group rollup. No spine cross join; the only
    * non-keyed exchange is the one-row (N) literal.
    */
  def tCloseness(df: DataFrame, groupExprs: Seq[(String, Column)],
      sensitive: Column): DataFrame = {
    val gNames = groupExprs.map(_._1)
    val cells = df
      .groupBy(groupExprs.map { case (n, c) => c.as(n) } :+ sensitive.as("__s"): _*)
      .agg(count(lit(1)).as("__ngs"))
      .localCheckpoint(true) // feeds the three totals AND the per-cell terms
    val sTotals = cells.groupBy(col("__s")).agg(sum(col("__ngs")).as("__ns"))
    val gTotals = cells.groupBy(gNames.map(col): _*)
      .agg(sum(col("__ngs")).as("__ng"))
    val nTotal = cells.agg(sum(col("__ngs")).as("__n"))
    // cells and gTotals share the group-key partitioning from their
    // groupBys, so this join re-uses the exchange; sTotals/nTotal are
    // tiny broadcast/one-row frames
    cells
      .join(gTotals, gNames)
      .join(broadcast(sTotals), "__s")
      .crossJoin(broadcast(nTotal))
      .groupBy(gNames.map(col): _*)
      .agg(
        first(col("__ng")).as("n"),
        sum(abs(col("__ngs") * col("__n") - col("__ns") * col("__ng")))
          .as("__numPresent"),
        sum(col("__ns")).as("__nsPresent"),
        first(col("__n")).as("__nt"))
      // absent-source tail: Σ_{s∉g} |0·N − N_s·n_g| = n_g·(N − Σ_{s∈g} N_s)
      .select((gNames.map(col) ++ Seq(col("n"),
        graft.queries.Norm.n4((col("__numPresent") +
          col("n") * (col("__nt") - col("__nsPresent"))).cast(DoubleType) /
          (lit(2L) * col("n") * col("__nt")).cast(DoubleType)).as("t_n4"))): _*)
  }

  /** [[tCloseness]] oracle rendering. `groupExprs` are (alias, SQL)
    * pairs; `sensitiveSql` the sensitive-attribute expression.
    */
  def tClosenessSql(table: String, groupExprs: Seq[(String, String)],
      sensitiveSql: String): String = {
    val n4 = graft.etl.OracleSql.n4 _
    val gAlias = groupExprs.map(_._1).mkString(", ")
    val gDefs = groupExprs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    s"""WITH __cells AS (SELECT $gDefs, $sensitiveSql AS __s,
       |    count(*) AS __ngs FROM $table GROUP BY ALL),
       |__st AS (SELECT __s, CAST(sum(__ngs) AS BIGINT) AS __ns
       |  FROM __cells GROUP BY 1),
       |__gt AS (SELECT $gAlias, CAST(sum(__ngs) AS BIGINT) AS __ng
       |  FROM __cells GROUP BY ALL),
       |__nt AS (SELECT CAST(sum(__ngs) AS BIGINT) AS __n FROM __cells)
       |SELECT $gAlias, any_value(__ng) AS n,
       |  ${n4("CAST(CAST(sum(abs(__ngs * __n - __ns * __ng)) AS BIGINT) + " +
        "any_value(__ng) * (any_value(__n) - CAST(sum(__ns) AS BIGINT)) AS DOUBLE)" +
        " / CAST(2 * any_value(__ng) * any_value(__n) AS DOUBLE)")} AS t_n4
       |FROM __cells
       |JOIN __gt USING ($gAlias)
       |JOIN __st USING (__s)
       |CROSS JOIN __nt
       |GROUP BY $gAlias""".stripMargin
  }

  // ---- CUSUM change-point scan -------------------------------------------

  /** Daily CUSUM change-point scan over a revenue stream: the
    * mean-centered cumulative sum `S_i = Σ_{j≤i}(x_j − x̄)`, whose
    * |max| excursion marks the most likely level-shift point (Page's
    * CUSUM in its offline scan form — the monitoring sibling of the
    * KS (q122) and PSI (q141) distribution drifts, which are blind to
    * WHEN a shift happened).
    *
    * Exactness: centering by the mean in one division would leave a
    * non-representable x̄; instead everything is scaled by n —
    * `d_i = x_i·n − T` (exact BIGINT, `T` = total) and
    * `S_i·n = Σ d_j` — so the whole trajectory is integer-exact and
    * the flagged argmax is tie-broken by earliest day. Output: the
    * full (day, rev_u, s_u, is_cp) trajectory — what a monitor plots
    * — with `s_u` in cent·n units.
    *
    * Scale shape: one partial-aggregable day rollup; the cumulative
    * window then runs on the DAY GRAIN (calendar-bounded, same
    * argument as [[ewmaDaily]]); the scan stats are one-row broadcast
    * literals.
    */
  def cusumDaily(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(centsU(col("o_totalprice")).cast(LongType)).as("rev_u"))
    val stats = daily.agg(count(lit(1)).as("__n"), sum(col("rev_u")).as("__t"))
    // the trajectory feeds THREE consumers (max scan, argmax pick,
    // final projection): checkpoint the day-grain frame (calendar-
    // bounded rows) so the corpus rollup runs once
    val cum = daily.crossJoin(broadcast(stats))
      .withColumn("s_u",
        sum(col("rev_u") * col("__n") - col("__t"))
          .over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint(true)
    val mx = cum.agg(max(abs(col("s_u"))).as("__mx"))
    val cp = cum.crossJoin(broadcast(mx))
      .where(abs(col("s_u")) === col("__mx"))
      .agg(min(col("day")).as("__cp"))
    cum.crossJoin(broadcast(cp))
      .select(col("day"), col("rev_u"), col("s_u"),
        (col("day") === col("__cp")).as("is_cp"))
      .orderBy("day")
  }

  /** [[cusumDaily]] oracle rendering. */
  def cusumDailySql(table: String): String =
    s"""WITH __daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(${centsUSql("o_totalprice")}) AS BIGINT) AS rev_u
       |  FROM $table GROUP BY 1),
       |__st AS (SELECT count(*) AS __n, CAST(sum(rev_u) AS BIGINT) AS __t
       |  FROM __daily),
       |__cum AS (SELECT day, rev_u,
       |    CAST(sum(rev_u * __n - __t) OVER (ORDER BY day
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_u
       |  FROM __daily CROSS JOIN __st),
       |__mx AS (SELECT max(abs(s_u)) AS __mx FROM __cum),
       |__cp AS (SELECT min(day) AS __cp FROM __cum CROSS JOIN __mx
       |  WHERE abs(s_u) = __mx)
       |SELECT day, rev_u, s_u, day = __cp AS is_cp
       |FROM __cum CROSS JOIN __cp ORDER BY day""".stripMargin

  // ---- differentially-private release (discrete Laplace) -----------------

  /** ε for the DP release and the derived discrete-Laplace CDF table.
    *
    * The noise is the two-sided geometric ("discrete Laplace")
    * distribution P(k) ∝ e^{−ε|k|} — the standard integer-valued DP
    * mechanism for counts. Like [[ewmaWeights]], the inverse-CDF
    * thresholds are materialized ONCE here (driver-side, k ∈ [−20,20],
    * tail mass ~2e-9 clamped into the ends) and injected as literals
    * into BOTH engines, so no runtime exp/ln — whose last-ulp libm
    * behavior differs across engines — ever executes. The only
    * runtime math is one integer hash, one exact division, and a
    * threshold CASE: bit-identical everywhere.
    */
  val DpEpsilon = 1.0
  private val DpMaxK = 20
  private[ops] val dpThresholds: Seq[(Double, Int)] = {
    val alpha = math.exp(-DpEpsilon)
    val p0 = (1.0 - alpha) / (1.0 + alpha)
    val ks = (-DpMaxK to DpMaxK)
    val probs = ks.map(k => p0 * math.pow(alpha, math.abs(k)))
    val total = probs.sum // renormalize the clamped tails
    val cum = probs.map(_ / total).scanLeft(0.0)(_ + _).tail
    // (upper CDF bound, k); the last bucket catches u=1 exactly
    cum.zip(ks).dropRight(1) :+ (1.1, DpMaxK)
  }

  /** Seeded deterministic uniform in (0,1) for a STRING key: the
    * kernel token hash (already in [0, 1e9)) pushed through the
    * two-round Lehmer mix. Deterministic stand-in for the mechanism's
    * randomness so the release is gate-verifiable; production swaps
    * this one column for a true RNG.
    */
  private def dpU01(key: Column, seed: Long): Column = {
    val h = TextOps.tokenHash(key)
    val r2 = ((((h % MixOps.P + MixOps.P) % MixOps.P + lit(seed)) * lit(48271L))
      % MixOps.P + lit(1L)) * lit(69621L) % MixOps.P
    (r2.cast(DoubleType) + lit(0.5d)) / lit(MixOps.P.toDouble)
  }

  private def dpU01Sql(keyE: String, seed: Long): String = {
    val h = TextOps.tokenHashSql(keyE)
    val p = MixOps.P
    s"(CAST(((($h % $p + $p) % $p + $seed) * 48271 % $p + 1) * 69621 % $p AS DOUBLE) + CAST('0.5' AS DOUBLE)) / CAST('$p' AS DOUBLE)"
  }

  /** ε=1 differentially-private per-group count release over a string
    * group column: `n_noisy = n + DiscreteLaplace(ε)`, noise drawn by
    * inverse CDF from the seeded per-group uniform. Output is pure
    * BIGINT — no float ever crosses an engine boundary. One
    * partial-aggregable count; the noise is a map-side projection of
    * the group key.
    */
  def dpCounts(df: DataFrame, groupCol: String, seed: Long): DataFrame = {
    val u = dpU01(col(groupCol), seed)
    val noise = dpThresholds.reverse.foldLeft(lit(DpMaxK)) {
      case (acc, (t, k)) => when(u < lit(t), lit(k)).otherwise(acc)
    }
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol), (col("__n") + noise.cast(LongType)).as("n_noisy"))
      .orderBy(groupCol)
  }

  /** [[dpCounts]] oracle rendering. */
  def dpCountsSql(table: String, groupCol: String, seed: Long): String = {
    val u = dpU01Sql(groupCol, seed)
    val cases = dpThresholds.dropRight(1).map { case (t, k) =>
      s"WHEN __u < CAST('$t' AS DOUBLE) THEN $k"
    }.mkString("\n    ")
    s"""WITH __g AS (SELECT $groupCol, count(*) AS __n, $u AS __u
       |  FROM $table GROUP BY 1)
       |SELECT $groupCol, CAST(__n + (CASE
       |    $cases
       |    ELSE $DpMaxK END) AS BIGINT) AS n_noisy
       |FROM __g ORDER BY $groupCol""".stripMargin
  }

  // ---- autocorrelation function ------------------------------------------

  /** Daily-revenue autocorrelation at lags 1..`maxLag`:
    * `r_ℓ = Σ_t d_t·d_{t+ℓ} / Σ_t d_t²` with `d_t = x_t·n − T` (the
    * q149 scaled-centering trick, so every term is an exact integer;
    * products reach ~1e25·days, summed in DECIMAL(38,0)/HUGEINT —
    * the corrMatrix discipline). The seasonality probe that tells a
    * forecaster which lags carry signal.
    *
    * Scale shape: one day-grain rollup (calendar-bounded), the lag
    * joins run on that tiny frame — explode 7 shifted copies, one
    * day-keyed join, one grouped moment sum.
    */
  def acfDaily(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(centsU(col("o_totalprice")).cast(LongType)).as("x"))
    val stats = daily.agg(count(lit(1)).as("__n"), sum(col("x")).as("__t"))
    val d = daily.crossJoin(broadcast(stats))
      .select(col("day"), (col("x") * col("__n") - col("__t")).as("d"))
      .localCheckpoint(true) // base for the denominator AND every lag side
    val den = d.agg(sum((col("d").cast(dec)) * col("d").cast(dec)).as("__den"))
    val shifted = d.withColumn("lag", explode(array((1 to maxLag).map(lit): _*)))
      .select(col("lag"), date_add(col("day"), col("lag")).as("day"),
        col("d").as("d_lag"))
    d.join(shifted, "day")
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("d").cast(dec) * col("d_lag").cast(dec)).as("__num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        graft.queries.Norm.n4(col("__num").cast(DoubleType) /
          col("__den").cast(DoubleType)).as("acf_n4"))
      .orderBy("lag")
  }

  /** [[acfDaily]] oracle rendering. */
  def acfDailySql(table: String, maxLag: Int = 7): String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH __daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(${centsUSql("o_totalprice")}) AS BIGINT) AS x
       |  FROM $table GROUP BY 1),
       |__st AS (SELECT count(*) AS __n, CAST(sum(x) AS BIGINT) AS __t
       |  FROM __daily),
       |__d AS (SELECT day, x * __n - __t AS d FROM __daily CROSS JOIN __st),
       |__den AS (SELECT sum(CAST(d AS HUGEINT) * d) AS __den FROM __d),
       |__sh AS (SELECT lag, day + CAST(lag AS INTEGER) AS day, d AS d_lag
       |  FROM __d, unnest(range(1, ${maxLag + 1})) AS u(lag)),
       |__m AS (SELECT lag, count(*) AS n_pairs,
       |    sum(CAST(__d.d AS HUGEINT) * __sh.d_lag) AS __num
       |  FROM __d JOIN __sh USING (day) GROUP BY 1)
       |SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
       |  ${n4("CAST(__num AS DOUBLE) / CAST(__den AS DOUBLE)")} AS acf_n4
       |FROM __m CROSS JOIN __den ORDER BY lag""".stripMargin
  }

  /** [[gapFillDaily]] oracle rendering. */
  def gapFillDailySql(table: String, from: String, to: String): String =
    s"""WITH __daily AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
       |    count(*) AS n,
       |    CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
       |  FROM $table
       |  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '$from' AND DATE '$to'
       |  GROUP BY 1, 2),
       |__grid AS (SELECT o_custkey, CAST(gs AS DATE) AS day
       |  FROM (SELECT DISTINCT o_custkey FROM __daily),
       |    generate_series(DATE '$from', DATE '$to', INTERVAL 1 DAY) t(gs)),
       |__j AS (SELECT g.o_custkey, g.day, d.n, d.rev
       |  FROM __grid g LEFT JOIN __daily d
       |    ON g.o_custkey = d.o_custkey AND g.day = d.day)
       |SELECT o_custkey, day, CAST(coalesce(n, 0) AS BIGINT) AS n_orders,
       |  CAST(coalesce(sum(coalesce(rev, 0)) OVER (PARTITION BY o_custkey
       |    ORDER BY day ROWS UNBOUNDED PRECEDING), 0) AS BIGINT) AS rev_cum,
       |  last_value(rev IGNORE NULLS) OVER (PARTITION BY o_custkey
       |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS rev_ffill
       |FROM __j ORDER BY o_custkey, day""".stripMargin

  // ---- Theil-Sen pairwise-slope median ----------------------------------

  /** The two middle order statistics of the Theil-Sen pairwise-slope
    * multiset `(r2−r1)·10⁶ div (d2−d1)` over all day pairs d1 < d2,
    * WITHOUT ever materializing a pair-sized census (round 17, the
    * stretched-calendar stress: the r11 one-pass form built a
    * (slope → count) census with near-pair cardinality — ~288M
    * nearly-distinct slopes at 24k days — and its shuffle spilled the
    * engine to a halt; measured q228 5.4 s at 2.5k days vs >10 min at
    * 25k).
    *
    * Three passes over the IMPLICIT pair stream (a broadcast range
    * self-join that is never persisted), each with O(nBuckets) or
    * O(pairs/nBuckets) state:
    *  1. probe — approx percentile cuts + the exact pair count; any
    *     contiguous cut placement yields the same order statistics,
    *     so sketch cuts cost no exactness (the globalRank argument).
    *  2. counts — exact per-bucket pair counts (nBuckets counters,
    *     map-side combined), prefix-summed into bucket offsets; the
    *     1-2 buckets holding ranks (n−1) div 2 and n div 2 are the
    *     targets.
    *  3. narrowed census — pairs in target buckets only (≈ 2/nBuckets
    *     of the mass) collapse to a (slope → count) census; exact
    *     within-bucket prefixes ride [[LayoutOps.censusCum]]
    *     partitioned by the outer bucket, and the two ranks are
    *     picked by integer rank containment.
    *
    * Returns one row (n_pairs, __v1, __v2); the Theil-Sen median is
    * (__v1 + __v2) / 2 (quantile_cont parity, q228) and the exact
    * doubled median is __v1 + __v2 (q251).
    */
  final case class PairSlopeMedian(nPairs: Long, v1: Option[Long],
      v2: Option[Long])

  /** Pairs of work per task for the implicit day-pair streams: the
    * parallelism pin is sized by the INPUT (pair count), not by slots
    * alone (VERDICT r17 #2 — a slots-sized pin fanned byte-tiny spans
    * across 32 tasks whose per-task work at sf0.1 sat below the
    * scheduling quantum; q201 measured 4.4 s at 32 cores vs 1.6 at 8).
    * 2¹⁸ pairs ≈ a few ms of slope arithmetic per task — small enough
    * to saturate slots at 24k days (288M pairs → capped at slots),
    * large enough that small inputs degrade to a handful of tasks.
    */
  private[graft] val PairsPerTask = 1L << 18

  /** Scale-adaptive parallelism for a compute-dense span: work-sized,
    * slot-capped (guide §2.5; VERDICT r17 #2).
    */
  private[graft] def densePin(spark: org.apache.spark.sql.SparkSession,
      workUnits: Long, unitsPerTask: Long = PairsPerTask): Int =
    math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      (workUnits + unitsPerTask - 1L) / unitsPerTask)).toInt

  def pairSlopeMedianParts(daily: DataFrame, dCol: String, rCol: String,
      nDays: Long, nBuckets: Int = 32): PairSlopeMedian = {
    // The pair stream is QUADRATIC in the census rows while the census
    // itself is byte-tiny, so partitioning derived from census BYTES
    // serializes the O(D²) enumeration — under AQE (the cluster and
    // bench default) the upstream day-agg coalesces to ONE partition
    // and every pair pass ran on one task (measured round 17: q373
    // class +2 s at sf0.1). Spread the census over an INPUT-SIZED
    // task count (round 18: the round-17 pin used raw slot count,
    // which at sf0.1 paid 32 scheduling quanta per ~90k-pair stage).
    //
    // Round-18 shape: the probe row (cuts + pair count) and the
    // per-bucket counts are CONFIG-bounded, so they collapse to driver
    // literals instead of checkpoint + broadcast-per-consumer — on the
    // bench host every extra job round-trip costs ~60-150 ms and this
    // function went from ~25 scheduler jobs to ~12. `daily` must be
    // materialized by the caller (every caller already checkpoints its
    // day-grain census) and `nDays` passed from the caller's count.
    val spark = daily.sparkSession
    val np = nDays * (nDays - 1L) / 2L
    val ck = daily.select(col(dCol).cast(LongType).as("__pd"),
      col(rCol).cast(LongType).as("__pr"))
      .repartition(densePin(spark, np)).localCheckpoint(true)
    val rhs = broadcast(ck.select(col("__pd").as("__pd2"),
      col("__pr").as("__pr2")))
    def pairs: DataFrame = ck.join(rhs, col("__pd") < col("__pd2"))
      .select(expr(
        // nullif: the bucket/target filters over __s merge into the
        // BNLJ join condition, where conjunct order is not guaranteed —
        // a bare ANSI div would throw on the not-yet-filtered pd2==pd
        // tuples (round 18); matched pairs always have divisor >= 1
        "(__pr2 - __pr) * 1000000 div nullif(__pd2 - __pd, 0)").as("__s"))
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    // cut placement costs NO exactness (ranks are exact for any
    // contiguous bucketing), so the probe pass never touches the full
    // pair stream: cuts come from a deterministic ≤2048-day stride
    // sample (≤2M sample pairs); the exact pair count is pure
    // arithmetic on the day count
    val stride = math.max(1L, (nDays + 2047L) / 2048L)
    val sL = ck.where(pmod(col("__pd"), lit(stride)) === 0)
    val sR = broadcast(sL.select(col("__pd").as("__pd2"),
      col("__pr").as("__pr2")))
    val cutsRow = sL.join(sR, col("__pd") < col("__pd2"))
      .select(expr(
        // nullif: the bucket/target filters over __s merge into the
        // BNLJ join condition, where conjunct order is not guaranteed —
        // a bare ANSI div would throw on the not-yet-filtered pd2==pd
        // tuples (round 18); matched pairs always have divisor >= 1
        "(__pr2 - __pr) * 1000000 div nullif(__pd2 - __pd, 0)").as("__s"))
      .agg(percentile_approx(col("__s"), array(fracs.map(lit): _*),
        lit(10000)).as("__cuts"))
      .head()
    // an empty/degenerate day frame has no sample pairs: one bucket
    val cuts: Seq[Long] =
      if (cutsRow.isNullAt(0)) Nil else cutsRow.getSeq[Long](0)
    def bktExpr: Column = cuts.zipWithIndex.foldLeft(lit(1)) {
      case (acc, (c, _)) => acc + when(col("__s") > lit(c), 1).otherwise(0)
    }
    val (r1, r2) = ((np - 1L) / 2L, np / 2L) // 0-based median ranks
    val counts = pairs.groupBy(bktExpr.as("__bkt"))
      .agg(count(lit(1)).as("__n")).collect()
    // driver arithmetic over ≤ nBuckets rows: offsets by bucket, then
    // the 1-2 buckets holding the two ranks
    var off = 0L
    val targets: Seq[(Int, Long)] = counts.sortBy(_.getInt(0)).flatMap { r =>
      val (lo, hi) = (off, off + r.getLong(1)); off = hi
      if (r2 >= lo && r1 < hi) Some(r.getInt(0) -> lo) else None
    }.toSeq
    if (targets.isEmpty) return PairSlopeMedian(np, None, None)
    // the narrowed filter is expressed as VALUE INTERVALS, not as a
    // bucket-fold membership test: the post-join filter merges into
    // the BNLL join condition, where a 31-deep CASE chain (with the
    // slope div inlined into every level) fell off codegen and ran
    // interpreted per CANDIDATE pair — measured 16.6 s for the census
    // stage at sf0.1 (round 18). Bucket b covers (cuts(b-2), cuts(b-1)]
    // on the 1-based fold (strict > lower bound keeps ties together).
    def intervalOf(b: Int): Column = {
      val lo = if (b >= 2) Some(cuts(b - 2)) else None
      val hi = if (b <= cuts.length) Some(cuts(b - 1)) else None
      (lo.map(col("__s") > _) ++ hi.map(col("__s") <= _))
        .reduceOption(_ && _).getOrElse(lit(true))
    }
    val narrowed = targets.map { case (b, _) => intervalOf(b) }.reduce(_ || _)
    // the outer bucket renames to __tbkt: censusCum builds its OWN
    // __bkt scratch column and would silently clobber this one
    val tbktExpr = targets.tail.foldLeft(
      when(intervalOf(targets.head._1), lit(targets.head._1))) {
      case (acc, (b, _)) => acc.when(intervalOf(b), lit(b))
    }
    val offExpr = targets.tail.foldLeft(
      when(col("__tbkt") === targets.head._1, lit(targets.head._2))) {
      case (acc, (b, o)) => acc.when(col("__tbkt") === b, lit(o))
    }
    val census = pairs.where(narrowed)
      .withColumn("__tbkt", tbktExpr)
      .groupBy("__tbkt", "__s").agg(count(lit(1)).as("__c"))
      .withColumn("__off", offExpr)
    val cum = LayoutOps.censusCum(census, "__s", Seq("__c"),
      inclusive = true, partCols = Seq("__tbkt"))
    val row = cum
      .withColumn("__cum0", col("__off") + col("__cum___c") - col("__c"))
      .agg(
        max(when(lit(r1) >= col("__cum0") &&
          lit(r1) < col("__cum0") + col("__c"), col("__s"))).as("__v1"),
        max(when(lit(r2) >= col("__cum0") &&
          lit(r2) < col("__cum0") + col("__c"), col("__s"))).as("__v2"))
      .head()
    PairSlopeMedian(np,
      if (row.isNullAt(0)) None else Some(row.getLong(0)),
      if (row.isNullAt(1)) None else Some(row.getLong(1)))
  }
}
