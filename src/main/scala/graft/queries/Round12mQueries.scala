package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Round-12 thirteenth wave: the time-series inference surfaces the
  * engine still owed — spectral period detection (periodogram),
  * distribution-free trend testing (Mann–Kendall), shape-constrained
  * regression (isotonic / PAVA via the minimax formula), and
  * cross-series lead–lag (CCF). The recurring trick: every series
  * collapses to a calendar-bounded census FIRST (days or months —
  * the q228 argument: the fact shuffle is the only data-sized step,
  * and day²/month³ fan-outs stay bounded forever), and all arithmetic
  * rides exact integer grids with DECIMAL(38,0) partials, with any
  * final irrational (sqrt) as ONE fixed IEEE expression over exact
  * integers landed on a grid before comparison.
  *
  * Cross-engine integer division: Spark's `div` truncates toward
  * zero, DuckDB's `//` floors — they differ on negatives, so every
  * signed division here is written sign(x) · (abs(x) div d) on BOTH
  * engines (truncation-toward-zero, explicitly).
  */
object Round12mQueries {

  private val dec = DecimalType(38, 0)
  private val Epoch = "1995-01-01"

  /** Daily gross-revenue census: day index (days since 1995-01-01,
    * always ≥ 0 in the fixture) → Σ extended price in cents. The one
    * fact-sized shuffle of q289/q290/q292; everything downstream
    * rides ≤ n_days rows.
    */
  private def dayRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "lineitem")
      .groupBy(datediff(to_date(col("l_shipdate")),
          lit(Epoch).cast("date")).cast(LongType).as("t"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5))
          .cast(LongType).cast(dec))
        .cast(LongType).as("x"))

  private val dayRevenueSql: String =
    s"""SELECT CAST(CAST(l_shipdate AS DATE) - DATE '$Epoch' AS BIGINT) AS t,
       |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
       |      AS BIGINT) AS x
       |  FROM lineitem GROUP BY 1""".stripMargin

  // -- q289: periodogram (dominant-period detection) ---------------------------
  // Single-frequency DFT power at the candidate periods 7/30/365 over
  // the mean-centered daily revenue series. The cos/sin weights are
  // COMPILE-TIME literals on a 1e-6 grid (computed once in Scala and
  // interpolated into BOTH engines — like q263's NDCG discounts), so
  // each S_c/S_s is an order-free exact integer sum; t mod P has only
  // P distinct weight rows, joined from a 402-row broadcast spine.
  // The mean is the trunc-div cents grid; power = S_c² + S_s² stays
  // exact in DECIMAL(38,0)/HUGEINT (≤ ~4e34 at a 1e-6 weight grid —
  // the reason the grid is NOT 1e-9: squares must fit 38 digits).
  private val Periods = Seq(7, 30, 365)
  private val fourierWeights: Seq[(Int, Int, Long, Long)] =
    Periods.flatMap { p =>
      (0 until p).map { k =>
        (p, k, math.round(math.cos(2 * math.Pi * k / p) * 1e6),
          math.round(math.sin(2 * math.Pi * k / p) * 1e6))
      }
    }

  private def q289(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = fourierWeights.toDF("p", "k", "wc", "ws")
    val census = dayRevenue(spark, sfDir)
      .localCheckpoint(true) // feeds the mean and the weighted sums
    val tot = census.agg(sum(col("x").cast(dec)).cast(LongType).as("__sx"),
      count(lit(1)).as("__n"))
    val cent = census.crossJoin(broadcast(tot))
      .select(col("t"), (col("x") - expr("__sx div __n")).as("y"))
    val sums = cent
      .join(broadcast(w), col("k") === col("t") % col("p"))
      .groupBy(col("p").cast(LongType).as("period"))
      .agg(sum(col("y").cast(dec) * col("wc")).as("scd"),
        sum(col("y").cast(dec) * col("ws")).as("ssd"),
        count(lit(1)).as("n_days"))
    val pw = sums.select(col("period"), col("n_days"),
        (when(col("scd") < 0, -1L).otherwise(1L) *
          expr("abs(scd) div 1000000")).as("s_c_u"),
        (when(col("ssd") < 0, -1L).otherwise(1L) *
          expr("abs(ssd) div 1000000")).as("s_s_u"),
        expr("(scd * scd + ssd * ssd) div 1000000000000000000")
          .as("power_u"))
      .localCheckpoint(true) // max pick + the dominant flag
    val mx = pw.agg(max(col("power_u")).as("__mx"))
    pw.crossJoin(broadcast(mx))
      .select(col("period"), col("n_days"), col("s_c_u"), col("s_s_u"),
        col("power_u"), (col("power_u") === col("__mx")).as("dominant"))
      .orderBy(col("period"))
  }

  private val q289Oracle: String = {
    val values = fourierWeights
      .map { case (p, k, wc, ws) => s"($p,$k,$wc,$ws)" }.mkString(",")
    s"""WITH census AS ($dayRevenueSql),
       |tot AS (SELECT CAST(sum(x) AS BIGINT) AS sx, count(*) AS n
       |  FROM census),
       |cent AS (SELECT t, x - (SELECT sx // n FROM tot) AS y FROM census),
       |w AS (SELECT * FROM (VALUES $values) w(p, k, wc, ws)),
       |sums AS (SELECT p AS period,
       |    CAST(sum(CAST(y AS HUGEINT) * wc) AS HUGEINT) AS sc,
       |    CAST(sum(CAST(y AS HUGEINT) * ws) AS HUGEINT) AS ss,
       |    count(*) AS n_days
       |  FROM cent JOIN w ON w.k = cent.t % w.p GROUP BY 1),
       |pw AS (SELECT period, n_days,
       |    CAST((CASE WHEN sc < 0 THEN -1 ELSE 1 END)
       |      * (abs(sc) // 1000000) AS BIGINT) AS s_c_u,
       |    CAST((CASE WHEN ss < 0 THEN -1 ELSE 1 END)
       |      * (abs(ss) // 1000000) AS BIGINT) AS s_s_u,
       |    CAST((sc*sc + ss*ss) // 1000000000000000000 AS BIGINT)
       |      AS power_u
       |  FROM sums)
       |SELECT CAST(period AS BIGINT) AS period, n_days, s_c_u, s_s_u,
       |  power_u, power_u = (SELECT max(power_u) FROM pw) AS dominant
       |FROM pw ORDER BY period""".stripMargin
  }

  // -- q290: Mann–Kendall trend test --------------------------------------------
  // Distribution-free monotone-trend test on daily revenue:
  // S = Σ_{i<j} sign(x_j − x_i) over the day-pair fan-out (days² is
  // calendar-bounded — the q228 argument — and the pair join is a
  // broadcast non-equi over the ≤ n_days census, never over facts);
  // tie-corrected variance from the VALUE census (18·Var stays an
  // exact integer); z is one fixed IEEE sqrt expression on a 1e-4
  // grid; the 5%-level verdict needs NO floating point at all —
  // (|S|−1)²·180000 > var18·38416 is an exact integer
  // cross-multiplication of z² > 1.96².
  private def q290(spark: SparkSession, sfDir: String): DataFrame = {
    val census = dayRevenue(spark, sfDir)
      .localCheckpoint(true) // pair fan-out + tie census + count
    val b = census.select(col("t").as("t2"), col("x").as("x2"))
    val s = census.crossJoin(broadcast(b))
      .where(col("t") < col("t2"))
      .agg(sum(when(col("x2") > col("x"), 1L)
        .when(col("x2") < col("x"), -1L).otherwise(0L)).as("s"))
    val nn = census.agg(count(lit(1)).as("n"))
    val ties = census.groupBy(col("x")).agg(count(lit(1)).as("tk"))
      .where(col("tk") > 1)
      .agg(coalesce(sum(col("tk") * (col("tk") - 1) *
        (lit(2L) * col("tk") + 5)), lit(0L)).as("tie_term"))
    s.crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
      .select(col("n").as("n_days"), col("s"),
        (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
          col("tie_term")).as("var18"))
      .select(col("n_days"), col("s"), col("var18"),
        when(col("s") > 0,
          floor((col("s") - 1).cast("double") /
            sqrt(col("var18").cast("double") / 18) * 10000 + lit(0.5))
            .cast(LongType))
        .when(col("s") < 0,
          floor((col("s") + 1).cast("double") /
            sqrt(col("var18").cast("double") / 18) * 10000 + lit(0.5))
            .cast(LongType))
        .otherwise(0L).as("z_u"),
        when(col("s") > 0 &&
            (col("s") - 1).cast(dec) * (col("s") - 1) * 180000 >
              col("var18").cast(dec) * 38416, "increasing")
        .when(col("s") < 0 &&
            (col("s") + 1).cast(dec) * (col("s") + 1) * 180000 >
              col("var18").cast(dec) * 38416, "decreasing")
        .otherwise("none").as("trend"))
  }

  private val q290Oracle: String =
    s"""WITH census AS ($dayRevenueSql),
       |pairs AS (SELECT CASE WHEN b.x > a.x THEN 1
       |    WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
       |  FROM census a JOIN census b ON a.t < b.t),
       |s AS (SELECT CAST(sum(sg) AS BIGINT) AS s FROM pairs),
       |nn AS (SELECT count(*) AS n FROM census),
       |ties AS (SELECT CAST(coalesce(sum(tk*(tk-1)*(2*tk+5)), 0)
       |    AS BIGINT) AS tie_term
       |  FROM (SELECT count(*) AS tk FROM census GROUP BY x
       |        HAVING count(*) > 1)),
       |v AS (SELECT n, s, n*(n-1)*(2*n+5) - tie_term AS var18
       |  FROM s, nn, ties)
       |SELECT n AS n_days, s, CAST(var18 AS BIGINT) AS var18,
       |  CASE WHEN s > 0 THEN CAST(floor((s-1)
       |      / sqrt(CAST(var18 AS DOUBLE) / 18) * 10000 + 0.5) AS BIGINT)
       |    WHEN s < 0 THEN CAST(floor((s+1)
       |      / sqrt(CAST(var18 AS DOUBLE) / 18) * 10000 + 0.5) AS BIGINT)
       |    ELSE 0 END AS z_u,
       |  CASE WHEN s > 0 AND CAST(s-1 AS HUGEINT)*(s-1)*180000
       |      > CAST(var18 AS HUGEINT)*38416 THEN 'increasing'
       |    WHEN s < 0 AND CAST(s+1 AS HUGEINT)*(s+1)*180000
       |      > CAST(var18 AS HUGEINT)*38416 THEN 'decreasing'
       |    ELSE 'none' END AS trend
       |FROM v""".stripMargin

  // -- q291: isotonic regression (PAVA minimax) --------------------------------
  // Non-decreasing least-squares fit of monthly average order value
  // via the closed minimax form fit_t = max_{i≤t} min_{j≥t} avg(i..j)
  // (pooled, count-weighted — exactly PAVA's pool-adjacent-violators
  // solution). The month census is the only fact shuffle; the range
  // expansion is month³/6 rows (~85k at 80 months) and CALENDAR-
  // bounded — it never grows with data, only with history length.
  // Pooled averages are micro-cent trunc-div picks (positive, so
  // trunc = floor on both engines); min/max over those integers is
  // exact, so the fit is deterministic and hash-stable.
  private def q291(spark: SparkSession, sfDir: String): DataFrame = {
    val mon = Tables.read(spark, sfDir, "orders")
      .groupBy((year(to_date(col("o_orderdate"))).cast(LongType) * 100 +
          month(to_date(col("o_orderdate")))).as("ym"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))
          .cast(LongType).cast(dec)).cast(LongType).as("sum_c"),
        count(lit(1)).as("cnt"))
      .localCheckpoint(true) // re-read as range ends, members, and spine
    val rng = mon.select(col("ym").as("yi"))
      .crossJoin(broadcast(mon.select(col("ym").as("yj"))))
      .where(col("yi") <= col("yj"))
      .join(broadcast(mon.select(col("ym").as("ymm"), col("sum_c"),
          col("cnt"))),
        col("ymm").between(col("yi"), col("yj")))
      .groupBy(col("yi"), col("yj"))
      .agg(sum(col("sum_c").cast(dec)).as("psum"),
        sum(col("cnt")).as("pcnt"))
      .select(col("yi"), col("yj"),
        expr("(psum * 1000000) div pcnt").as("avg_u"))
    val mins = rng
      .join(broadcast(mon.select(col("ym").as("ymt"))),
        col("ymt").between(col("yi"), col("yj")))
      .groupBy(col("yi"), col("ymt"))
      .agg(min(col("avg_u")).as("mn"))
    val fit = mins.groupBy(col("ymt").as("ym"))
      .agg(max(col("mn")).as("fit_u"))
    mon.join(fit, Seq("ym"))
      .select(col("ym"), col("cnt").as("n_orders"),
        expr("(CAST(sum_c AS DECIMAL(38,0)) * 1000000) div cnt")
          .as("avg_u"),
        col("fit_u"))
      .orderBy(col("ym"))
  }

  private val q291Oracle: String =
    """WITH mon AS (SELECT CAST(year(CAST(o_orderdate AS DATE))*100
      |    + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
      |    CAST(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT))
      |      AS BIGINT) AS sum_c,
      |    count(*) AS cnt FROM orders GROUP BY 1),
      |rng AS (SELECT a.ym AS yi, b.ym AS yj,
      |    CAST(sum(m.sum_c) AS HUGEINT)*1000000
      |      // CAST(sum(m.cnt) AS HUGEINT) AS avg_u
      |  FROM mon a JOIN mon b ON a.ym <= b.ym
      |  JOIN mon m ON m.ym BETWEEN a.ym AND b.ym
      |  GROUP BY 1, 2),
      |mins AS (SELECT yi, t.ym AS ymt, min(avg_u) AS mn
      |  FROM rng JOIN mon t ON t.ym BETWEEN rng.yi AND rng.yj
      |  GROUP BY 1, 2),
      |fit AS (SELECT ymt AS ym, CAST(max(mn) AS BIGINT) AS fit_u
      |  FROM mins GROUP BY 1)
      |SELECT mon.ym, cnt AS n_orders,
      |  CAST(CAST(sum_c AS HUGEINT)*1000000 // cnt AS BIGINT) AS avg_u, fit_u
      |FROM mon JOIN fit ON fit.ym = mon.ym ORDER BY mon.ym""".stripMargin

  // -- q292: cross-correlation lead–lag (CCF) -----------------------------------
  // Which way does daily ORDER VOLUME lead daily SHIP REVENUE? Pearson
  // r between x_t (order count) and y_{t+lag} (revenue cents) at lags
  // −7..+7, over the inner join of the two day censuses. Both
  // censuses are the only fact shuffles; the 15-lag spine and the
  // ≤ n_days revenue census broadcast. Sufficient statistics
  // accumulate in DECIMAL(38,0); r is ONE fixed IEEE expression over
  // their exact values, landed on a 1e-6 grid, with try_divide / NULL
  // parity on a degenerate (zero-variance) lag sample.
  private val CcfMaxLag = 7

  private def q292(spark: SparkSession, sfDir: String): DataFrame = {
    val xc = Tables.read(spark, sfDir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")),
          lit(Epoch).cast("date")).cast(LongType).as("t"))
      .agg(count(lit(1)).as("x"))
    val yc = dayRevenue(spark, sfDir)
      .select(col("t").as("ty"), col("x").as("y"))
    val lags = broadcast(spark.range(2 * CcfMaxLag + 1)
      .select((col("id") - CcfMaxLag).as("lag")))
    val st = xc.crossJoin(lags)
      .join(broadcast(yc), col("ty") === col("t") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
    val d = (c: String) => col(c).cast("double")
    val r = st.select(col("lag"), col("n").as("n_days"),
        floor(try_divide(d("n") * d("sxy") - d("sx") * d("sy"),
            sqrt((d("n") * d("sxx") - d("sx") * d("sx")) *
              (d("n") * d("syy") - d("sy") * d("sy")))) * 1000000 +
          lit(0.5)).cast(LongType).as("r_ppm"))
      .localCheckpoint(true) // peak pick over the 15-row frame
    val mx = r.agg(max(abs(col("r_ppm"))).as("__mx"))
    r.crossJoin(broadcast(mx))
      .select(col("lag"), col("n_days"), col("r_ppm"),
        (abs(col("r_ppm")) === col("__mx")).as("peak"))
      .orderBy(col("lag"))
  }

  private val q292Oracle: String =
    s"""WITH xc AS (SELECT
       |    CAST(CAST(o_orderdate AS DATE) - DATE '$Epoch' AS BIGINT) AS t,
       |    count(*) AS x FROM orders GROUP BY 1),
       |yc AS (SELECT t AS ty, x AS y FROM ($dayRevenueSql)),
       |lags AS (SELECT CAST(range AS BIGINT) - $CcfMaxLag AS lag
       |  FROM range(0, ${2 * CcfMaxLag + 1})),
       |st AS (SELECT lag, count(*) AS n,
       |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
       |    CAST(sum(CAST(x AS HUGEINT)*y) AS HUGEINT) AS sxy,
       |    CAST(sum(CAST(x AS HUGEINT)*x) AS HUGEINT) AS sxx,
       |    CAST(sum(CAST(y AS HUGEINT)*y) AS HUGEINT) AS syy
       |  FROM xc, lags JOIN yc ON ty = xc.t + lag GROUP BY 1),
       |r AS (SELECT lag, n AS n_days,
       |    CAST(floor((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
       |        - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
       |      / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
       |        * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
       |      * 1000000 + 0.5) AS BIGINT) AS r_ppm
       |  FROM st)
       |SELECT lag, n_days, r_ppm,
       |  abs(r_ppm) = (SELECT max(abs(r_ppm)) FROM r) AS peak
       |FROM r ORDER BY lag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q289_periodogram", q289, Some(q289Oracle)),
    QueryDef("q290_mann_kendall", q290, Some(q290Oracle)),
    QueryDef("q291_isotonic_trend", q291, Some(q291Oracle)),
    QueryDef("q292_ccf_leadlag", q292, Some(q292Oracle)))
}
