package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-12 first wave: exact rank statistics at scale — Spearman
  * rank correlation, Gini/Lorenz concentration, trimmed & winsorized
  * means, and Kendall tau-b — all on the bucketed-census prefix
  * machinery (q223/q228/q231), so no exact statistic ever funnels a
  * data-sized frame through a single reducer.
  */
object Round12Queries {

  private val dec = DecimalType(38, 0)

  /** The q223 bucketed-prefix building block, shared by this wave:
    * given a value census (valCol, cntCol), attach `__cum0` = exact
    * count of census mass strictly below each row's value — computed
    * as sketch-cut buckets (placement needs no exactness; any value-
    * contiguous bucketing yields the same global prefix sums) + a
    * `nBuckets`-row carry frame + bucket-local windows. One census-
    * sized shuffle, no single-partition window.
    */
  private[queries] def withCum0(census: DataFrame, valCol: String,
      cntCol: String, nBuckets: Int = 32): DataFrame = {
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = census.agg(percentile_approx(col(valCol),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
    val bucketed = census.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until nBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col(valCol) > element_at(col("__cuts"), i), 1)
            .otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true)
    val carries = bucketed.groupBy("__bkt")
      .agg(sum(col(cntCol)).as("__bsum"))
      .withColumn("__carry",
        coalesce(sum(col("__bsum")).over(Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__carry"))
    val w = Window.partitionBy("__bkt").orderBy(col(valCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(carries), "__bkt")
      .withColumn("__cum0",
        col("__carry") + coalesce(sum(col(cntCol)).over(w), lit(0L)))
      .drop("__bkt", "__carry")
  }

  /** Exact interpolated quantiles at fractions `nums(i)/den` from a
    * value census — `quantile_cont` semantics WITHOUT the
    * single-reducer value→count map Spark's `percentile` builds
    * (the q228 lesson generalized to multi-quantile): global ranks
    * come from [[withCum0]], each quantile's two order statistics
    * are picked by integer rank comparison, and the interpolation
    * h = (n−1)·num/den runs on EXACT integers (k₁ = (n−1)·num div
    * den, delta = ((n−1)·num mod den)/den — dyadic-exact for den a
    * power of two) so the assembled cut doubles are bit-identical to
    * quantile_cont's lower + delta·(higher − lower). Returns ONE row:
    * (`__cuts` array<double> in `nums` order, `__n` total count).
    */
  private[queries] def exactQuantiles(census: DataFrame, valCol: String,
      cntCol: String, den: Int, nums: Seq[Int]): DataFrame = {
    require(den > 0 && Integer.bitCount(den) == 1,
      s"den must be a power of two for exact dyadic deltas: $den")
    val tot = census.agg(sum(col(cntCol)).as("__n"))
    val r = withCum0(census, valCol, cntCol).crossJoin(broadcast(tot))
    val picks = nums.flatMap { i =>
      val k1 = s"((__n - 1) * $i) div $den"
      val k2 = s"least($k1 + 1, __n - 1)"
      Seq(
        max(when(expr(k1) >= col("__cum0") &&
          expr(k1) < col("__cum0") + col(cntCol), col(valCol)))
          .as(s"__v1_$i"),
        max(when(expr(k2) >= col("__cum0") &&
          expr(k2) < col("__cum0") + col(cntCol), col(valCol)))
          .as(s"__v2_$i"))
    }
    r.agg(picks.head, picks.tail: _*)
      .crossJoin(broadcast(tot))
      .select(array(nums.map { i =>
        col(s"__v1_$i").cast(DoubleType) +
          (expr(s"((__n - 1) * $i) % $den").cast(DoubleType) /
            lit(den.toDouble)) *
          (col(s"__v2_$i") - col(s"__v1_$i")).cast(DoubleType)
      }: _*).as("__cuts"), col("__n"))
  }

  // -- q236: Spearman rank correlation -----------------------------------------
  // The nonparametric correlation every drift/quality dashboard wants
  // next to Pearson (q111's class): exact tie-aware (mid-rank)
  // Spearman between quantity and extended price, at scale. The data-
  // sized work is ONE joint (x, y) census shuffle; each marginal
  // collapses to its own value census whose DOUBLED mid-ranks
  // (r2 = 2·cum + t + 1 — doubling keeps tie midpoints integer) come
  // from the bucketed prefix machinery (x's 50-value domain gets a
  // plain tiny-frame window; y's ~1M-value domain gets the buckets).
  // Pearson-on-ranks moments are exact DECIMAL(38,0) sums over the
  // joint census (capacity: N·(2N)² needs N ≤ ~1e12 — comfortably
  // past 100 TB row counts); ONE double expression at the end, n4.
  private def q236(spark: SparkSession, sfDir: String): DataFrame = {
    val joint = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_quantity").cast(LongType).as("x"),
        floor(col("l_extendedprice")).cast(LongType).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds both marginals + the moment pass
    // x: bounded 50-value domain — census is ≤50 rows; a plain
    // ordered window on a frame this size is driver-grade
    val xr = joint.groupBy("x").agg(sum(col("n")).as("t"))
      .withColumn("__cum0", coalesce(sum(col("t"))
        .over(Window.orderBy("x").rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("x"), (lit(2L) * col("__cum0") + col("t") + lit(1L))
        .as("r2x"))
    // y: unbounded domain — the bucketed machinery
    val yr = withCum0(
      joint.groupBy("y").agg(sum(col("n")).as("t")), "y", "t")
      .select(col("y"), (lit(2L) * col("__cum0") + col("t") + lit(1L))
        .as("r2y"))
    val m = joint.join(broadcast(xr), "x").join(yr, "y")
      .agg(sum(col("n")).as("nn"),
        sum(col("n").cast(dec) * col("r2x")).as("sa"),
        sum(col("n").cast(dec) * col("r2y")).as("sb"),
        sum(col("n").cast(dec) * col("r2x") * col("r2x")).as("saa"),
        sum(col("n").cast(dec) * col("r2y") * col("r2y")).as("sbb"),
        sum(col("n").cast(dec) * col("r2x") * col("r2y")).as("sab"))
    m.select(col("nn").as("n_rows"),
      Norm.n4(
        (col("nn").cast(dec) * col("sab") - col("sa") * col("sb"))
          .cast(DoubleType) /
        (sqrt((col("nn").cast(dec) * col("saa") - col("sa") * col("sa"))
          .cast(DoubleType)) *
         sqrt((col("nn").cast(dec) * col("sbb") - col("sb") * col("sb"))
          .cast(DoubleType)))).as("spearman_n4"))
  }

  private val q236Oracle: String =
    s"""WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x,
       |    CAST(floor(l_extendedprice) AS BIGINT) AS y
       |  FROM lineitem),
       |joint AS (SELECT x, y, count(*) AS n FROM b GROUP BY 1, 2),
       |xr AS (SELECT x, 2 * CAST(coalesce(sum(t) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) + t + 1 AS r2x
       |  FROM (SELECT x, CAST(sum(n) AS BIGINT) AS t
       |        FROM joint GROUP BY 1)),
       |yr AS (SELECT y, 2 * CAST(coalesce(sum(t) OVER (ORDER BY y
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) + t + 1 AS r2y
       |  FROM (SELECT y, CAST(sum(n) AS BIGINT) AS t
       |        FROM joint GROUP BY 1)),
       |m AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    sum(CAST(n AS HUGEINT) * r2x) AS sa,
       |    sum(CAST(n AS HUGEINT) * r2y) AS sb,
       |    sum(CAST(n AS HUGEINT) * r2x * r2x) AS saa,
       |    sum(CAST(n AS HUGEINT) * r2y * r2y) AS sbb,
       |    sum(CAST(n AS HUGEINT) * r2x * r2y) AS sab
       |  FROM joint JOIN xr USING (x) JOIN yr USING (y))
       |SELECT nn AS n_rows,
       |  ${graft.etl.OracleSql.n4(
      "CAST(CAST(nn AS HUGEINT) * sab - sa * sb AS DOUBLE) / " +
        "(sqrt(CAST(CAST(nn AS HUGEINT) * saa - sa * sa AS DOUBLE)) * " +
        "sqrt(CAST(CAST(nn AS HUGEINT) * sbb - sb * sb AS DOUBLE)))")}
       |    AS spearman_n4
       |FROM m""".stripMargin

  // -- q237: Gini coefficient + Lorenz deciles ---------------------------------
  // The inequality readout on per-customer revenue (q194's top-1%
  // question generalized to the whole curve): Gini from the exact
  // rank-weighted sum G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over the
  // distributed global rank (q166's bucketed machinery — ties break
  // by custkey; tied VALUES make the sum tie-order-invariant), plus
  // the 10-point Lorenz curve: per revenue-rank decile, exact share
  // of total revenue in ppm and the cumulative share. Everything
  // integer until one double division.
  private def q237(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.LayoutOps
    val perCust = Tables.read(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType))
        .as("rev_u"))
    val ranked = LayoutOps.globalRank(perCust, "rev_u", "o_custkey")
      .localCheckpoint(true) // Gini moments + decile census share it
    val n = ranked.agg(count(lit(1)).as("__n"))
    val gini = ranked.crossJoin(broadcast(n))
      .agg(max(col("__n")).as("n_cust"),
        sum(col("rank").cast(dec) * col("rev_u")).as("__s1"),
        sum(col("rev_u").cast(dec)).as("__s"))
      .select(col("n_cust"),
        Norm.n4((lit(2).cast(dec) * col("__s1") -
          (col("n_cust") + lit(1)).cast(dec) * col("__s"))
          .cast(DoubleType) /
          (col("n_cust").cast(dec) * col("__s")).cast(DoubleType))
          .as("gini_n4"))
    val dc = ranked.crossJoin(broadcast(n))
      .groupBy(expr("(rank - 1) * 10 div __n").as("decile"))
      .agg(count(lit(1)).as("n_cust_d"), sum(col("rev_u")).as("rev_d"))
    dc.crossJoin(broadcast(gini))
      .withColumn("__cum", sum(col("rev_d")).over(
        Window.orderBy("decile").rowsBetween(
          Window.unboundedPreceding, 0))) // 10-row frame
      .crossJoin(broadcast(ranked.agg(sum(col("rev_u").cast(dec))
        .as("__tot"))))
      .select(col("decile"), col("n_cust_d"),
        expr("cast(rev_d as decimal(38,0)) * 1000000 div __tot")
          .as("share_ppm"),
        expr("cast(__cum as decimal(38,0)) * 1000000 div __tot")
          .as("cum_share_ppm"),
        col("n_cust"), col("gini_n4"))
      .orderBy("decile")
  }

  private val q237Oracle: String =
    """WITH pc AS (SELECT o_custkey,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev_u
      |  FROM orders GROUP BY 1),
      |r AS (SELECT rev_u,
      |    row_number() OVER (ORDER BY rev_u, o_custkey) AS rank,
      |    count(*) OVER () AS n FROM pc),
      |g AS (SELECT CAST(any_value(n) AS BIGINT) AS n_cust,
      |    floor((2 * sum(CAST(rank AS HUGEINT) * rev_u)
      |      - (any_value(n) + 1) * CAST(sum(rev_u) AS HUGEINT))
      |      / CAST(CAST(any_value(n) AS HUGEINT) * sum(rev_u) AS DOUBLE)
      |      * 10000 + 0.5) / 10000.0 AS gini_n4,
      |    CAST(sum(rev_u) AS HUGEINT) AS tot FROM r),
      |d AS (SELECT CAST((rank - 1) * 10 // n AS BIGINT) AS decile,
      |    count(*) AS n_cust_d, CAST(sum(rev_u) AS BIGINT) AS rev_d
      |  FROM r GROUP BY 1)
      |SELECT decile, n_cust_d,
      |  CAST(CAST(rev_d AS HUGEINT) * 1000000 // tot AS BIGINT) AS share_ppm,
      |  CAST(CAST(sum(rev_d) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
      |    * 1000000 // tot AS BIGINT) AS cum_share_ppm,
      |  n_cust, gini_n4
      |FROM d CROSS JOIN g ORDER BY decile""".stripMargin

  // -- q238: trimmed & winsorized means per group ------------------------------
  // The robust location pair the σ-based winsorizer (M5/q09) can't
  // give: PERCENTILE-based 10% trim/winsorize per return flag, exact
  // at scale. Per group, the value census + bucketed global prefix
  // (buckets from GLOBAL cuts — value-contiguity holds within every
  // group, so per-group carry frames keyed (grp, bucket) stay exact)
  // yields each row's rank interval [cum0, cum0+cnt); the trimmed
  // core is an INTERVAL-OVERLAP sum — min(hi, end) − max(lo, start)
  // clamped — and winsorization adds k copies of the two exact
  // boundary order statistics, picked by the same rank comparison as
  // q228's median. Means leave integers only in the final division.
  private def q238(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType)
          .as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val fracs = (1 until 32).map(_.toDouble / 32)
    val cuts = census.agg(percentile_approx(col("v"),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
    val bucketed = census.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until 32).foldLeft(lit(1)) { case (acc, i) =>
        acc + when(col("v") > element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true)
    val carries = bucketed.groupBy("grp", "__bkt")
      .agg(sum(col("cnt")).as("__bsum"))
      .withColumn("__carry",
        coalesce(sum(col("__bsum")).over(Window.partitionBy("grp")
          .orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("grp"), col("__bkt"), col("__carry"))
    val w = Window.partitionBy("grp", "__bkt").orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = bucketed.join(broadcast(carries), Seq("grp", "__bkt"))
      .withColumn("__cum0",
        col("__carry") + coalesce(sum(col("cnt")).over(w), lit(0L)))
    val totals = census.groupBy("grp").agg(sum(col("cnt")).as("n_g"))
      .select(col("grp"), col("n_g"), expr("n_g div 10").as("k"))
    ranked.join(broadcast(totals), "grp")
      .groupBy("grp")
      .agg(max(col("n_g")).as("n_g"), max(col("k")).as("k"),
        // interval overlap of [cum0, cum0+cnt) with the kept core
        // [k, n_g-k): exact multiplicity of each value in the trim
        sum(col("v").cast(dec) *
          greatest(least(col("__cum0") + col("cnt"), col("n_g") - col("k"))
            - greatest(col("__cum0"), col("k")), lit(0L))).as("__core"),
        // the two winsorization boundary order statistics (0-indexed
        // ranks k and n_g-k-1), by rank-interval membership
        max(when(col("k") >= col("__cum0") &&
          col("k") < col("__cum0") + col("cnt"), col("v"))).as("__vlo"),
        max(when(col("n_g") - col("k") - 1 >= col("__cum0") &&
          col("n_g") - col("k") - 1 < col("__cum0") + col("cnt"),
          col("v"))).as("__vhi"))
      .select(col("grp"), col("n_g"), col("k"),
        Norm.n4(col("__core").cast(DoubleType) /
          (col("n_g") - lit(2L) * col("k")).cast(DoubleType) / lit(100.0))
          .as("trimmed_mean_n4"),
        Norm.n4((col("__core") + col("k").cast(dec) * col("__vlo")
          + col("k").cast(dec) * col("__vhi")).cast(DoubleType) /
          col("n_g").cast(DoubleType) / lit(100.0))
          .as("winsor_mean_n4"))
      .orderBy("grp")
  }

  private val q238Oracle: String =
    s"""WITH b AS (SELECT l_returnflag AS grp,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
       |  FROM lineitem),
       |census AS (SELECT grp, v, count(*) AS cnt FROM b GROUP BY 1, 2),
       |ranked AS (SELECT grp, v, cnt,
       |    CAST(coalesce(sum(cnt) OVER (PARTITION BY grp ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum0
       |  FROM census),
       |t AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_g,
       |    CAST(sum(cnt) // 10 AS BIGINT) AS k
       |  FROM census GROUP BY 1),
       |agg AS (SELECT r.grp, any_value(n_g) AS n_g, any_value(k) AS k,
       |    sum(CAST(v AS HUGEINT) * greatest(
       |      least(cum0 + cnt, n_g - k) - greatest(cum0, k), 0)) AS core,
       |    max(CASE WHEN k >= cum0 AND k < cum0 + cnt THEN v END) AS vlo,
       |    max(CASE WHEN n_g - k - 1 >= cum0 AND n_g - k - 1 < cum0 + cnt
       |      THEN v END) AS vhi
       |  FROM ranked r JOIN t ON r.grp = t.grp GROUP BY 1)
       |SELECT grp, n_g, k,
       |  ${graft.etl.OracleSql.n4(
      "CAST(core AS DOUBLE) / CAST(n_g - 2 * k AS DOUBLE) / 100.0")}
       |    AS trimmed_mean_n4,
       |  ${graft.etl.OracleSql.n4(
      "CAST(core + CAST(k AS HUGEINT) * vlo + CAST(k AS HUGEINT) * vhi " +
        "AS DOUBLE) / CAST(n_g AS DOUBLE) / 100.0")} AS winsor_mean_n4
       |FROM agg ORDER BY grp""".stripMargin

  // -- q239: Kendall tau-b on the day-grain trend ------------------------------
  // q228's robustness companion: the CONCORDANCE view of the same
  // daily-revenue trend. Day index is strictly increasing, so every
  // pair is decided purely by sign(r₂−r₁): C − D = Σ sign, ties in
  // revenue counted from the day-frame's own value census. τ_b =
  // (C−D)/√(n₀·(n₀−t_r)) with n₀ = n(n−1)/2 — all counts exact
  // BIGINT from the calendar-bounded broadcast pair join (days², not
  // data² — the q228 argument), one double expression, n4.
  private def q239(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice"))).as("r"))
      .select(unix_date(col("day")).cast(LongType).as("d"), col("r"))
      .localCheckpoint(true)
    val pairs = daily.select(col("d").as("d1"), col("r").as("r1"))
      .join(broadcast(daily.select(col("d").as("d2"), col("r").as("r2"))),
        col("d1") < col("d2"))
      .agg(count(lit(1)).as("n0"),
        sum(when(col("r2") > col("r1"), 1L)
          .when(col("r2") < col("r1"), -1L).otherwise(0L)).as("cmd"))
    val ties = daily.groupBy("r").agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) div 2")), lit(0L)).as("tr"))
    pairs.crossJoin(broadcast(ties))
      .select(col("n0"), col("cmd").as("c_minus_d"), col("tr"),
        Norm.n4(col("cmd").cast(DoubleType) /
          sqrt(col("n0").cast(DoubleType) *
            (col("n0") - col("tr")).cast(DoubleType))).as("tau_b_n4"))
  }

  private val q239Oracle: String =
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(floor(o_totalprice)) AS BIGINT) AS r
       |  FROM orders GROUP BY 1),
       |dd AS (SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS d, r
       |  FROM daily),
       |p AS (SELECT count(*) AS n0,
       |    CAST(sum(CASE WHEN b.r > a.r THEN 1
       |      WHEN b.r < a.r THEN -1 ELSE 0 END) AS BIGINT) AS cmd
       |  FROM dd a JOIN dd b ON a.d < b.d),
       |ti AS (SELECT CAST(coalesce(sum(t * (t - 1) // 2), 0) AS BIGINT) AS tr
       |  FROM (SELECT r, count(*) AS t FROM dd GROUP BY 1))
       |SELECT n0, cmd AS c_minus_d, tr,
       |  ${graft.etl.OracleSql.n4(
      "CAST(cmd AS DOUBLE) / sqrt(CAST(n0 AS DOUBLE) * " +
        "CAST(n0 - tr AS DOUBLE))")} AS tau_b_n4
       |FROM p CROSS JOIN ti""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q236_spearman", q236, Some(q236Oracle)),
    QueryDef("q237_gini_lorenz", q237, Some(q237Oracle)),
    QueryDef("q238_trimmed_means", q238, Some(q238Oracle)),
    QueryDef("q239_kendall_tau", q239, Some(q239Oracle)))
}
