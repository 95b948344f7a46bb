package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 fifteenth wave: regression discontinuity (q363 — local
  * linear intercept gap at a cutoff), one Huber IRLS step (q364 —
  * robust regression as two moment passes), FD-violation repair
  * suggestions (q365 — majority-consequent cleaning plan), and the
  * Poisson dispersion test (q366 — overdispersion per event type).
  */
object Round13oQueries {

  // -- q363: regression discontinuity -----------------------------------------------------
  // The causal design for threshold rules: does crossing the
  // acctbal ≥ 5000 gate change the repeat-'F' rate? Local linear fits
  // on each side of the cutoff (bandwidth ±$2000), effect = the gap
  // between the two intercepts AT the cutoff — both intercepts exact
  // rationals of one conditional-moment scan (y is 0/1 so every
  // moment is a count), ppm-gridded with sign-safe division. The
  // naive mean gap is reported alongside — the bias RD removes.
  private val RdCut = 500000L // cents
  private val RdBw = 200000L

  private def q363(spark: SparkSession, sfDir: String): DataFrame = {
    val fcnt = Tables.read(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("ck")).agg(count(lit(1)).as("fc"))
    val units = Tables.read(spark, sfDir, "customer")
      .select(col("c_custkey").as("ck"),
        (expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)") - RdCut)
          .as("x"))
      .where(abs(col("x")) <= RdBw)
      .join(fcnt, Seq("ck"), "left")
      .withColumn("y", when(coalesce(col("fc"), lit(0L)) >= 4L, 1L)
        .otherwise(0L))
      .withColumn("side", when(col("x") >= 0, "r").otherwise("l"))
    def sdiv(num: String, den: String) =
      s"CASE WHEN $num < 0 THEN -((-($num)) * 1000000 div ($den))" +
        s" ELSE ($num) * 1000000 div ($den) END"
    val sides = units.groupBy("side").agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .withColumn("a_ppm", expr(sdiv(
        "sy * sxx - CAST(sx AS DECIMAL(38,0)) * sxy",
        "n * sxx - CAST(sx AS DECIMAL(38,0)) * sx")))
      .withColumn("mean_ppm", expr("sy * 1000000 div n"))
    val l = sides.where(col("side") === "l").select(col("n").as("n_l"),
      col("a_ppm").as("a_l_ppm"), col("mean_ppm").as("mean_l_ppm"))
    val r = sides.where(col("side") === "r").select(col("n").as("n_r"),
      col("a_ppm").as("a_r_ppm"), col("mean_ppm").as("mean_r_ppm"))
    l.crossJoin(r).select(col("n_l"), col("n_r"), col("a_l_ppm"),
      col("a_r_ppm"), (col("a_r_ppm") - col("a_l_ppm")).as("rd_effect_ppm"),
      (col("mean_r_ppm") - col("mean_l_ppm")).as("naive_gap_ppm"))
  }

  private val q363Oracle: String = {
    def sdiv(num: String, den: String) =
      s"CASE WHEN $num < 0 THEN -((-($num)) * 1000000 // ($den))" +
        s" ELSE ($num) * 1000000 // ($den) END"
    s"""WITH fcnt AS (SELECT o_custkey AS ck, count(*) AS fc FROM orders
       |  WHERE o_orderstatus = 'F' GROUP BY 1),
       |units AS (SELECT
       |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) - $RdCut AS x,
       |    CASE WHEN coalesce(fc, 0) >= 4 THEN 1 ELSE 0 END AS y
       |  FROM customer LEFT JOIN fcnt ON c_custkey = ck
       |  WHERE abs(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) - $RdCut)
       |    <= $RdBw),
       |sides AS (SELECT CASE WHEN x >= 0 THEN 'r' ELSE 'l' END AS side,
       |    count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM units GROUP BY 1),
       |fit AS (SELECT side, n,
       |    ${sdiv("sy * sxx - CAST(sx AS HUGEINT) * sxy",
        "n * sxx - CAST(sx AS HUGEINT) * sx")} AS a_ppm,
       |    sy * 1000000 // n AS mean_ppm
       |  FROM sides)
       |SELECT l.n AS n_l, r.n AS n_r,
       |  CAST(l.a_ppm AS BIGINT) AS a_l_ppm,
       |  CAST(r.a_ppm AS BIGINT) AS a_r_ppm,
       |  CAST(r.a_ppm - l.a_ppm AS BIGINT) AS rd_effect_ppm,
       |  CAST(r.mean_ppm - l.mean_ppm AS BIGINT) AS naive_gap_ppm
       |FROM (SELECT * FROM fit WHERE side = 'l') l
       |CROSS JOIN (SELECT * FROM fit WHERE side = 'r') r""".stripMargin
  }

  // -- q364: one Huber IRLS step ------------------------------------------------------------
  // Robust regression, the distributed way: pass 1 is plain OLS on the
  // day-grain revenue trend; the tuning constant k = 1.345·MAD of the
  // pass-1 residuals (exact interpolating percentile on the calendar-
  // bounded residual frame — the q43/q251 parity class); pass 2
  // re-fits with Huber weights w = min(1, k/|e|) carried as exact ppm
  // rationals into DECIMAL/HUGEINT weighted moments. Output: both
  // fits, k, and how many days were downweighted.
  private def q364(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(expr("CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01'" +
        " AS BIGINT)").as("x"))
      .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))" +
        " div 100").as("y"))
      .localCheckpoint(true) // feeds OLS, residuals, and the re-fit
    def sdiv(num: String, den: String) =
      s"CASE WHEN $num < 0 THEN -((-($num)) * 1000 div ($den))" +
        s" ELSE ($num) * 1000 div ($den) END"
    val m0 = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .withColumn("b0_milli", expr(sdiv(
        "n * sxy - CAST(sx AS DECIMAL(38,0)) * sy",
        "n * sxx - CAST(sx AS DECIMAL(38,0)) * sx")))
      .withColumn("a0_milli", expr(
        "CASE WHEN sy * 1000 - b0_milli * sx < 0" +
          " THEN -((-(sy * 1000 - b0_milli * sx)) div n)" +
          " ELSE (sy * 1000 - b0_milli * sx) div n END"))
    val resid = daily.crossJoin(broadcast(m0
      .select(col("a0_milli"), col("b0_milli"))))
      .withColumn("e", expr("abs(y * 1000 - (a0_milli + b0_milli * x))"))
      .localCheckpoint(true) // residual frame: k pick AND the re-fit
    val k = resid
      .agg(expr("CAST(floor(percentile(e, 0.5) * 1.345 + 0.5) AS BIGINT)")
        .as("k_milli"))
    val w2 = resid.crossJoin(broadcast(k))
      .withColumn("w", expr("CASE WHEN e <= k_milli THEN 1000000" +
        " ELSE k_milli * 1000000 div e END"))
    val m1 = w2.agg(max(col("k_milli")).as("k_milli"),
      sum(when(col("w") < 1000000L, 1L).otherwise(0L)).as("n_down"),
      sum(expr("CAST(w AS DECIMAL(38,0))")).as("nw"),
      sum(expr("CAST(w AS DECIMAL(38,0)) * x")).as("sxw"),
      sum(expr("CAST(w AS DECIMAL(38,0)) * y")).as("syw"),
      sum(expr("CAST(w AS DECIMAL(38,0)) * x * x")).as("sxxw"),
      sum(expr("CAST(w AS DECIMAL(38,0)) * x * y")).as("sxyw"))
      .withColumn("b1_milli", expr(sdiv("nw * sxyw - sxw * syw",
        "nw * sxxw - sxw * sxw")))
      .withColumn("a1_milli", expr(
        "CASE WHEN syw * 1000 - b1_milli * sxw < 0" +
          " THEN -((-(syw * 1000 - b1_milli * sxw)) div nw)" +
          " ELSE (syw * 1000 - b1_milli * sxw) div nw END"))
    m0.select(col("a0_milli"), col("b0_milli"))
      .crossJoin(broadcast(m1.select(col("k_milli"), col("n_down"),
        col("a1_milli"), col("b1_milli"))))
      .select(col("b0_milli"), col("a0_milli"), col("k_milli"),
        col("n_down"), col("b1_milli"), col("a1_milli"))
  }

  private val q364Oracle: String = {
    def sdiv(num: String, den: String) =
      s"CASE WHEN $num < 0 THEN -((-($num)) * 1000 // ($den))" +
        s" ELSE ($num) * 1000 // ($den) END"
    s"""WITH daily AS (SELECT
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
       |      AS x,
       |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // 100
       |      AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |m0 AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy FROM daily),
       |f0 AS (SELECT *, ${sdiv("n * sxy - CAST(sx AS HUGEINT) * sy",
        "n * sxx - CAST(sx AS HUGEINT) * sx")} AS b0_milli FROM m0),
       |f0b AS (SELECT *, CASE WHEN sy * 1000 - b0_milli * sx < 0
       |    THEN -((-(sy * 1000 - b0_milli * sx)) // n)
       |    ELSE (sy * 1000 - b0_milli * sx) // n END AS a0_milli FROM f0),
       |resid AS (SELECT x, y,
       |    abs(y * 1000 - (a0_milli + b0_milli * x)) AS e
       |  FROM daily CROSS JOIN f0b),
       |kk AS (SELECT CAST(floor(quantile_cont(e, 0.5) * 1.345 + 0.5)
       |    AS BIGINT) AS k_milli FROM resid),
       |w2 AS (SELECT x, y, CASE WHEN e <= k_milli THEN 1000000
       |    ELSE k_milli * 1000000 // e END AS w, k_milli
       |  FROM resid CROSS JOIN kk),
       |m1 AS (SELECT max(k_milli) AS k_milli,
       |    count(CASE WHEN w < 1000000 THEN 1 END) AS n_down,
       |    sum(CAST(w AS HUGEINT)) AS nw,
       |    sum(CAST(w AS HUGEINT) * x) AS sxw,
       |    sum(CAST(w AS HUGEINT) * y) AS syw,
       |    sum(CAST(w AS HUGEINT) * x * x) AS sxxw,
       |    sum(CAST(w AS HUGEINT) * x * y) AS sxyw FROM w2),
       |f1 AS (SELECT *, ${sdiv("nw * sxyw - sxw * syw",
        "nw * sxxw - sxw * sxw")} AS b1_milli FROM m1),
       |f1b AS (SELECT *, CASE WHEN syw * 1000 - b1_milli * sxw < 0
       |    THEN -((-(syw * 1000 - b1_milli * sxw)) // nw)
       |    ELSE (syw * 1000 - b1_milli * sxw) // nw END AS a1_milli
       |  FROM f1)
       |SELECT CAST(b0_milli AS BIGINT) AS b0_milli,
       |  CAST(a0_milli AS BIGINT) AS a0_milli,
       |  k_milli, CAST(n_down AS BIGINT) AS n_down,
       |  CAST(b1_milli AS BIGINT) AS b1_milli,
       |  CAST(a1_milli AS BIGINT) AS a1_milli
       |FROM f0b CROSS JOIN f1b""".stripMargin
  }

  // -- q365: FD-violation repair suggestions --------------------------------------------------
  // The data-cleaning planner for a near-FD (order → returnflag):
  // per determinant group take the consequent census; a CLEAN group
  // has one value, a REPAIRABLE group has a ≥⅔ majority (repair =
  // rewrite the minority rows to it), the rest are AMBIGUOUS and go
  // to review. Output: the group-status census plus total rows a
  // repair pass would rewrite.
  private def q365(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("ok"), col("l_returnflag").as("v"))
      .agg(count(lit(1)).as("c"))
    val groups = census.groupBy("ok").agg(
      count(lit(1)).as("n_values"), sum(col("c")).as("n_rows"),
      max(col("c")).as("top_c"))
    groups
      .withColumn("status", when(col("n_values") === 1, "clean")
        .when(col("top_c") * 3L >= col("n_rows") * 2L, "repairable")
        .otherwise("ambiguous"))
      .groupBy("status").agg(count(lit(1)).as("n_groups"),
        sum(when(col("status") === "repairable",
          col("n_rows") - col("top_c")).otherwise(0L)).as("rows_to_repair"))
      .orderBy("status")
  }

  private val q365Oracle: String =
    """WITH census AS (SELECT l_orderkey AS ok, l_returnflag AS v,
      |    count(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |groups AS (SELECT ok, count(*) AS n_values,
      |    CAST(sum(c) AS BIGINT) AS n_rows, max(c) AS top_c
      |  FROM census GROUP BY 1),
      |st AS (SELECT CASE WHEN n_values = 1 THEN 'clean'
      |    WHEN top_c * 3 >= n_rows * 2 THEN 'repairable'
      |    ELSE 'ambiguous' END AS status, n_rows, top_c
      |  FROM groups)
      |SELECT status, count(*) AS n_groups,
      |  CAST(sum(CASE WHEN status = 'repairable' THEN n_rows - top_c
      |    ELSE 0 END) AS BIGINT) AS rows_to_repair
      |FROM st GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q366: Poisson dispersion test ------------------------------------------------------------
  // Overdispersion diagnosis per event type on daily counts: the
  // dispersion index D = (n−1)·s²/x̄ is χ²(n−1) under Poisson — D in
  // exact milli units via the computational identity (n·Σc² − (Σc)²)
  // over (Σc), everything integer; D/(n−1) ≫ 1 flags clumping (the
  // "is a negative binomial needed?" gate).
  private def q366(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "events")
      .groupBy(col("event_type").as("ty"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    daily.groupBy("ty").agg(count(lit(1)).as("n_days"),
      sum(col("c")).as("s"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("q"))
      .select(col("ty"), col("n_days"), col("s").as("n_events"),
        // D = Σ(c−c̄)²/c̄ = (n·Σc² − (Σc)²) / Σc exactly
        expr("(n_days * q - CAST(s AS DECIMAL(38,0)) * s) * 1000" +
          " div CAST(s AS DECIMAL(38,0))").as("d_milli"),
        expr("(n_days * q - CAST(s AS DECIMAL(38,0)) * s) * 1000" +
          " div (CAST(s AS DECIMAL(38,0)) * (n_days - 1))")
          .as("var_mean_ratio_milli"))
      .orderBy("ty")
  }

  private val q366Oracle: String =
    """WITH daily AS (SELECT event_type AS ty, CAST(ts AS DATE) AS day,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |agg AS (SELECT ty, count(*) AS n_days, CAST(sum(c) AS BIGINT) AS s,
      |    sum(CAST(c AS HUGEINT) * c) AS q FROM daily GROUP BY 1)
      |SELECT ty, n_days, s AS n_events,
      |  CAST((n_days * q - CAST(s AS HUGEINT) * s) * 1000
      |    // CAST(s AS HUGEINT) AS BIGINT) AS d_milli,
      |  CAST((n_days * q - CAST(s AS HUGEINT) * s) * 1000
      |    // (CAST(s AS HUGEINT) * (n_days - 1)) AS BIGINT)
      |    AS var_mean_ratio_milli
      |FROM agg ORDER BY ty""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q363_regression_discontinuity", q363, Some(q363Oracle)),
    QueryDef("q364_huber_irls", q364, Some(q364Oracle)),
    QueryDef("q365_fd_repair", q365, Some(q365Oracle)),
    QueryDef("q366_dispersion_test", q366, Some(q366Oracle)),
  )
}
