package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-12 ninth wave: the classical-statistics testing kit the A/B
  * family still lacked — one-way ANOVA (F + η²), Brown–Forsythe
  * variance homogeneity (the assumption check ANOVA itself needs),
  * Cliff's delta effect size (the nonparametric companion to q223's
  * Mann-Whitney U, from the SAME value-census algebra with zero pair
  * fan-out), and Cohen's d / Hedges' g. Every sufficient statistic is
  * an exact integer (DECIMAL(38,0) partials); the final test
  * statistics are single fixed IEEE expressions landed on the n4
  * grid.
  */
object Round12iQueries {

  private val dec = DecimalType(38, 0)

  // value grid shared by the wave: whole dollars (the totalprice
  // domain is dense enough at cents to make censuses needlessly wide)
  private def xU = floor(col("o_totalprice")).cast(LongType)
  private val xUSql = "CAST(floor(o_totalprice) AS BIGINT)"

  /** Exact one-way-ANOVA sufficient statistics from a (group, n, s,
    * ss) frame: between/within sums of squares on the integer grid
    * (each group's s²/n is an exact integer-div pick — DECIMAL
    * intermediates, so s² never wraps; the floor bias is part of the
    * statistic's definition and identical on both engines), then
    * F and η² from the exact integers.
    */
  private def anovaFrom(perGroup: DataFrame): DataFrame =
    perGroup
      .select(col("n"), col("s"), col("ss"),
        expr("CAST(s AS DECIMAL(38,0)) * s div n").as("term"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("n_total"),
        sum(col("s")).as("s_total"),
        sum(col("ss").cast(dec)).as("ss_total"),
        sum(col("term")).as("t_sum"))
      .select(col("k"), col("n_total"),
        (col("t_sum") -
          expr("CAST(s_total AS DECIMAL(38,0)) * s_total div n_total"))
          .as("ssb_u"),
        (col("ss_total") - col("t_sum").cast(dec)).cast(LongType)
          .as("ssw_u"))
      .select(col("k"), col("n_total"), col("ssb_u"), col("ssw_u"),
        expr("ssb_u * 1000000 div (ssb_u + ssw_u)").as("eta2_ppm"),
        Norm.n4((col("ssb_u").cast(DoubleType) /
            (col("k") - 1).cast(DoubleType)) /
          (col("ssw_u").cast(DoubleType) /
            (col("n_total") - col("k")).cast(DoubleType))).as("f_n4"))

  /** The same algebra in DuckDB over a CTE `pg(g, n, s, ss)`. */
  private def anovaSql(pgCte: String): String =
    s"""$pgCte,
       |terms AS (SELECT n, s, ss,
       |    CAST(CAST(s AS HUGEINT) * s // n AS BIGINT) AS term FROM pg),
       |tot AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_total,
       |    CAST(sum(s) AS BIGINT) AS s_total, sum(CAST(ss AS HUGEINT)) AS ss_total,
       |    CAST(sum(term) AS BIGINT) AS t_sum FROM terms),
       |sq AS (SELECT k, n_total,
       |    CAST(t_sum - CAST(s_total AS HUGEINT) * s_total // n_total
       |      AS BIGINT) AS ssb_u,
       |    CAST(ss_total - t_sum AS BIGINT) AS ssw_u FROM tot)
       |SELECT k, n_total, ssb_u, ssw_u,
       |  CAST(ssb_u * 1000000 // (ssb_u + ssw_u) AS BIGINT) AS eta2_ppm,
       |  ${graft.etl.OracleSql.n4(
      "(CAST(ssb_u AS DOUBLE) / CAST(k - 1 AS DOUBLE)) / " +
        "(CAST(ssw_u AS DOUBLE) / CAST(n_total - k AS DOUBLE))")} AS f_n4
       |FROM sq""".stripMargin

  // -- q271: one-way ANOVA (order value by priority class) ----------------------
  // Does order priority shift order value? F over the 5 priority
  // classes. Scale shape: ONE partial+final aggregate produces the 5
  // sufficient-statistic rows (n, Σx, Σx² per group, the Σx² partial
  // in DECIMAL from the first merge); everything after is 5-row
  // algebra. The F-statistic's inputs (ssb_u/ssw_u) are exact
  // integers, so the one double division hashes identically.
  private def q271(spark: SparkSession, sfDir: String): DataFrame =
    anovaFrom(Tables.read(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("g"), xU.as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum((col("x") * col("x")).cast(dec)).as("ss")))

  private val q271Oracle: String = anovaSql(
    s"""WITH pg AS (SELECT o_orderpriority AS g, count(*) AS n,
       |    CAST(sum(x) AS BIGINT) AS s,
       |    sum(CAST(x AS HUGEINT) * x) AS ss
       |  FROM (SELECT o_orderpriority, $xUSql AS x FROM orders)
       |  GROUP BY 1)""".stripMargin)

  // -- q272: Brown-Forsythe variance homogeneity ---------------------------------
  // The assumption q271 rides on, tested the robust way: ANOVA on
  // |x − median_g| (Brown–Forsythe's median centering — Levene's mean
  // version chases outliers). The doubled grid keeps the interpolated
  // group median integral (2·median of integers is exact in a
  // double), so every deviation is an exact integer and the whole
  // q271 algebra applies unchanged. The grouped exact percentile is
  // the P4-class contract (5 groups).
  private def q272(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("g"), xU.as("x"))
      .localCheckpoint(true) // median probe + the deviation census
    val med = base.groupBy("g")
      .agg(floor(percentile(col("x"), lit(0.5)) * 2 + lit(0.5))
        .cast(LongType).as("m2"))
    anovaFrom(base.join(broadcast(med), "g")
      .select(col("g"), abs(col("x") * 2 - col("m2")).as("z"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("z")).as("s"),
        sum((col("z") * col("z")).cast(dec)).as("ss")))
  }

  private val q272Oracle: String = anovaSql(
    s"""WITH b AS (SELECT o_orderpriority AS g, $xUSql AS x FROM orders),
       |med AS (SELECT g, CAST(floor(quantile_cont(x, 0.5) * 2 + 0.5)
       |    AS BIGINT) AS m2 FROM b GROUP BY 1),
       |pg AS (SELECT b.g, count(*) AS n,
       |    CAST(sum(abs(x * 2 - m2)) AS BIGINT) AS s,
       |    sum(CAST(abs(x * 2 - m2) AS HUGEINT) * abs(x * 2 - m2)) AS ss
       |  FROM b JOIN med ON med.g = b.g GROUP BY 1)""".stripMargin)

  // -- q273: Cliff's delta (urgent vs low priority order values) ------------------
  // The nonparametric effect size q223's U owes its readers: δ =
  // (#(a>b) − #(a<b)) / (n_a·n_b) over ALL cross pairs — computed
  // with ZERO pair fan-out from the same (value → per-group count)
  // census and bucketed prefix sums (sketch-cut value-contiguous
  // buckets + 32-row carry frame; exact for any cut placement). The
  // less-than count needs no second pass: #< = n_a·n_b − #> − #ties.
  private val CdBuckets = 32

  private def q273(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "orders")
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "5-LOW"))
      .select(xU.as("x"),
        when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L).as("g"))
      .groupBy("x")
      .agg(sum(lit(1L) - col("g")).as("ca"), sum(col("g")).as("cb"))
      .localCheckpoint(true) // cuts probe + bucketed prefix
    val fracs = (1 until CdBuckets).map(_.toDouble / CdBuckets)
    val cuts = census.agg(percentile_approx(col("x"),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
    val bucketed = census.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until CdBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col("x").cast(DoubleType) >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true)
    val carries = bucketed.groupBy("__bkt").agg(sum(col("cb")).as("__bsum"))
      .withColumn("__carry",
        coalesce(sum(col("__bsum")).over(Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__carry"))
    val w = Window.partitionBy("__bkt").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(carries), "__bkt")
      .withColumn("__cumb",
        col("__carry") + coalesce(sum(col("cb")).over(w), lit(0L)))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("ca").cast(dec) * col("__cumb").cast(dec)).as("__ugt"),
        sum(col("ca").cast(dec) * col("cb").cast(dec)).as("__tied"))
      .select(col("n_a"), col("n_b"),
        col("__ugt").cast(LongType).as("u_gt"),
        (col("n_a").cast(dec) * col("n_b").cast(dec) - col("__ugt") -
          col("__tied")).cast(LongType).as("u_lt"),
        col("__tied").cast(LongType).as("pairs_tied"),
        Norm.n4((col("__ugt") - (col("n_a").cast(dec) * col("n_b") -
            col("__ugt") - col("__tied"))).cast(DoubleType) /
          (col("n_a").cast(dec) * col("n_b")).cast(DoubleType))
          .as("delta_n4"))
  }

  private val q273Oracle: String =
    s"""WITH b AS (SELECT $xUSql AS x,
       |    CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS g
       |  FROM orders
       |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '5-LOW')),
       |census AS (SELECT x,
       |    CAST(sum(1 - g) AS BIGINT) AS ca,
       |    CAST(sum(g) AS BIGINT) AS cb
       |  FROM b GROUP BY 1),
       |pre AS (SELECT ca, cb,
       |    CAST(coalesce(sum(cb) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cumb
       |  FROM census),
       |agg AS (SELECT
       |    CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
       |    sum(CAST(ca AS HUGEINT) * cumb) AS ugt,
       |    sum(CAST(ca AS HUGEINT) * cb) AS tied
       |  FROM pre)
       |SELECT n_a, n_b, CAST(ugt AS BIGINT) AS u_gt,
       |  CAST(CAST(n_a AS HUGEINT) * n_b - ugt - tied AS BIGINT) AS u_lt,
       |  CAST(tied AS BIGINT) AS pairs_tied,
       |  ${graft.etl.OracleSql.n4(
      "CAST(ugt - (CAST(n_a AS HUGEINT) * n_b - ugt - tied) AS DOUBLE) " +
        "/ CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE)")} AS delta_n4
       |FROM agg""".stripMargin

  // -- q274: Cohen's d / Hedges' g -----------------------------------------------
  // The parametric effect size for the same urgent-vs-low contrast:
  // pooled-SD standardized mean difference, plus Hedges' small-sample
  // correction. Sufficient statistics (n, Σx, Σx² per group, DECIMAL
  // partials) come from ONE aggregate; d and g are single fixed IEEE
  // expressions over the exact integers, landed on the n4 grid.
  private def q274(spark: SparkSession, sfDir: String): DataFrame = {
    val d = DoubleType
    Tables.read(spark, sfDir, "orders")
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "5-LOW"))
      .select(xU.as("x"),
        when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L).as("g"))
      .agg(
        sum(lit(1L) - col("g")).as("n_a"), sum(col("g")).as("n_b"),
        sum(when(col("g") === 0L, col("x")).otherwise(0L)).as("s_a"),
        sum(when(col("g") === 1L, col("x")).otherwise(0L)).as("s_b"),
        sum(when(col("g") === 0L, (col("x") * col("x")).cast(dec))
          .otherwise(lit(0L).cast(dec))).as("ss_a"),
        sum(when(col("g") === 1L, (col("x") * col("x")).cast(dec))
          .otherwise(lit(0L).cast(dec))).as("ss_b"))
      .select(col("n_a"), col("n_b"), col("s_a"), col("s_b"),
        col("ss_a").cast(LongType).as("ss_a"),
        col("ss_b").cast(LongType).as("ss_b"))
      .withColumn("d_n4", Norm.n4(
        (col("s_a").cast(d) / col("n_a").cast(d) -
          col("s_b").cast(d) / col("n_b").cast(d)) /
        sqrt(((col("ss_a").cast(d) -
            col("s_a").cast(d) * col("s_a").cast(d) / col("n_a").cast(d)) +
          (col("ss_b").cast(d) -
            col("s_b").cast(d) * col("s_b").cast(d) / col("n_b").cast(d))) /
          (col("n_a") + col("n_b") - 2).cast(d))))
      .withColumn("g_n4", Norm.n4(col("d_n4") *
        (lit(1.0) - lit(3.0) /
          (lit(4.0) * (col("n_a") + col("n_b")).cast(d) - lit(9.0)))))
  }

  private val q274Oracle: String = {
    def D(e: String) = s"CAST($e AS DOUBLE)"
    val dExpr =
      s"""(${D("s_a")} / ${D("n_a")} - ${D("s_b")} / ${D("n_b")})
         | / sqrt(((${D("ss_a")} - ${D("s_a")} * ${D("s_a")} / ${D("n_a")})
         |   + (${D("ss_b")} - ${D("s_b")} * ${D("s_b")} / ${D("n_b")}))
         |   / ${D("n_a + n_b - 2")})""".stripMargin.replace("\n", " ")
    s"""WITH b AS (SELECT $xUSql AS x,
       |    CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS g
       |  FROM orders
       |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '5-LOW')),
       |agg AS (SELECT
       |    CAST(sum(1 - g) AS BIGINT) AS n_a, CAST(sum(g) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN g = 0 THEN x ELSE 0 END) AS BIGINT) AS s_a,
       |    CAST(sum(CASE WHEN g = 1 THEN x ELSE 0 END) AS BIGINT) AS s_b,
       |    CAST(sum(CASE WHEN g = 0 THEN CAST(x AS HUGEINT) * x
       |      ELSE 0 END) AS BIGINT) AS ss_a,
       |    CAST(sum(CASE WHEN g = 1 THEN CAST(x AS HUGEINT) * x
       |      ELSE 0 END) AS BIGINT) AS ss_b
       |  FROM b),
       |dd AS (SELECT n_a, n_b, s_a, s_b, ss_a, ss_b,
       |    ${graft.etl.OracleSql.n4(dExpr)} AS d_n4 FROM agg)
       |SELECT n_a, n_b, s_a, s_b, ss_a, ss_b, d_n4,
       |  ${graft.etl.OracleSql.n4(
      "d_n4 * (1.0 - 3.0 / (4.0 * CAST(n_a + n_b AS DOUBLE) - 9.0))")}
       |    AS g_n4
       |FROM dd""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q271_anova_f", q271, Some(q271Oracle)),
    QueryDef("q272_brown_forsythe", q272, Some(q272Oracle)),
    QueryDef("q273_cliffs_delta", q273, Some(q273Oracle)),
    QueryDef("q274_cohens_d", q274, Some(q274Oracle)))
}
